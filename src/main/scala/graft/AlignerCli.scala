package graft

import graft.core.{Wfa, WfaWorkspace}
import graft.sources.SequenceFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CLI with the reference's argument surface
  * (/root/reference/src/aligner.cu:75-139):
  *
  *   -f <file>        sequence file of `>pattern` / `<text` line pairs
  *   -n <num>         number of alignments to read (0 = all)
  *   -l <len>         max sequence length. The reference sizes each
  *                    sequence slot at 2*len bytes ("100% error rate",
  *                    utils/sequence_reader.h:66-71) and memcpy's lines in
  *                    UNCHECKED (utils/sequence_reader.cu:166-179) — an
  *                    over-length line silently overflows its slot. graft
  *                    enforces the same 2*len capacity but fails fast with
  *                    a clear error instead; 0/absent = unbounded (buffers
  *                    are sized dynamically).
  *   -b <batch>       batch size -> partition size (pairs per task)
  *   -t <threads>     worker threads -> local[t] cores
  *   -p               print CIGARs ("idx: cigar", reference
  *                    src/wavefront.cu:293-300)
  *   -d <band>        max distance band (reference fixed 64,
  *                    wavefront_structures.h:62; configurable here)
  *
  * A user of the reference CLI can run the same file through this entry
  * point and get the same distances and CIGARs (golden-tested).
  */
object AlignerCli {

  final case class Config(file: String = "", num: Long = 0, seqLen: Int = 0,
                          batch: Int = 4096, threads: Int = 0,
                          print: Boolean = false, band: Int = 64)

  /** Accepts the reference's short AND long forms (its generic parser
    * matches either, /root/reference/utils/arg_handler.c:88-138; long
    * names from the options table, src/aligner.cu:77-136). */
  def parseArgs(args: Array[String]): Config = {
    var c = Config()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "-f" | "--file" => c = c.copy(file = args(i + 1)); i += 2
        case "-n" | "--num-alignments" => c = c.copy(num = args(i + 1).toLong); i += 2
        case "-l" | "--seq-len" => c = c.copy(seqLen = args(i + 1).toInt); i += 2
        case "-b" | "--batch-size" => c = c.copy(batch = args(i + 1).toInt); i += 2
        case "-t" | "--cpu-threads" => c = c.copy(threads = args(i + 1).toInt); i += 2
        case "-p" | "--print-cigars" => c = c.copy(print = true); i += 1
        case "-d" | "--max-distance" => c = c.copy(band = args(i + 1).toInt); i += 2
        case other => throw new IllegalArgumentException(s"unknown option $other")
      }
    }
    require(c.file.nonEmpty,
      "usage: AlignerCli -f|--file <file> [-n|--num-alignments num] [-b|--batch-size batch] " +
        "[-t|--cpu-threads threads] [-d|--max-distance band] [-p|--print-cigars]")
    c
  }

  /** The alignment job: read pairs, score with banded WFA, return
    * (pair_id, distance, saturated, cigar). */
  def run(spark: SparkSession, c: Config): DataFrame = {
    import spark.implicits._
    var pairs = SequenceFile.read(spark, c.file)
    if (c.num > 0) pairs = pairs.where(col("pair_id") < c.num)
    if (c.seqLen > 0) {
      // reference capacity parity: each slot holds 2*seq_len bytes
      val cap = 2L * c.seqLen
      val over = pairs.where(
        length(col("pattern")) > cap || length(col("text")) > cap)
      val bad = over.select(min("pair_id")).head()
      require(bad.isNullAt(0),
        s"sequence pair ${bad.getLong(0)} exceeds --seq-len capacity " +
          s"(2*${c.seqLen} = $cap bytes); the reference would silently " +
          "overflow its buffer here — rerun with a larger -l or drop it")
    }
    val band = c.band
    val n = math.max(pairs.count(), 1L)
    val parts = math.max((n / math.max(c.batch, 1)).toInt, 1)
    pairs
      .repartition(parts, col("pair_id"))
      .select($"pair_id".as[Long],
        $"pattern".cast("binary").as[Array[Byte]],
        $"text".cast("binary").as[Array[Byte]])
      .mapPartitions { it =>
        val ws = new WfaWorkspace(band, withCigar = true)
        it.map { case (id, p, t) =>
          val r = Wfa.align(p, t, ws)
          (id, r.distance, r.saturated, r.cigar)
        }
      }
      .toDF("pair_id", "distance", "saturated", "cigar")
  }

  def main(args: Array[String]): Unit = {
    val c = parseArgs(args)
    val cores = if (c.threads > 0) c.threads.toString else "*"
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-aligner")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val out = run(spark, c).orderBy("pair_id").collect()
    val wall = (System.nanoTime() - t0) / 1e9
    if (c.print) out.foreach { r =>
      println(s"${r.getLong(0)}: ${if (r.getBoolean(2)) "*" else r.getString(3)}")
    }
    println(f"Alignment executed. Pairs: ${out.length}, wall time $wall%.3fs")
    spark.stop()
  }
}
