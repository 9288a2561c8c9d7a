package graft.sources

import graft.{AlignerCli, SparkTestBase}
import graft.core.{Levenshtein, Packing}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.util.Random

/** Reference-format I/O (S1), 2-bit packing parity (S3/S4), and the CLI
  * surface (S14/E1). */
class SequenceFileSpec extends AnyFunSuite with SparkTestBase {

  private def writeSeqFile(pairs: Seq[(String, String)]): String = {
    val f = Files.createTempFile("seqs", ".txt")
    val content = pairs.map { case (p, t) => s">$p\n<$t" }.mkString("", "\n", "\n")
    Files.writeString(f, content)
    f.toString
  }

  test("read parses >/< line pairs positionally") {
    val path = writeSeqFile(Seq(("ACGT", "ACTT"), ("GG", "GGG"), ("", "A")))
    val rows = SequenceFile.read(spark, path).orderBy("pair_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(1) == "ACGT" && rows(0).getString(2) == "ACTT")
    assert(rows(2).getString(1) == "" && rows(2).getString(2) == "A")
  }

  test("read fails fast on malformed markers (reference parity)") {
    val f = Files.createTempFile("bad", ".txt")
    Files.writeString(f, ">ACGT\n>OOPS\n")
    val e = intercept[Exception] {
      SequenceFile.read(spark, f.toString).collect()
    }
    assert(e.getMessage.contains("malformed") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed")))
  }

  test("write/read roundtrip") {
    import spark.implicits._
    val df = Seq((0L, "ACGT", "AC"), (1L, "T", "TTT"))
      .toDF("pair_id", "pattern", "text")
    val dir = Files.createTempDirectory("seqout").toString + "/out"
    SequenceFile.write(df, dir)
    val back = SequenceFile.read(spark, dir).orderBy("pair_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((0L, "ACGT", "AC"), (1L, "T", "TTT")))
  }

  test("2-bit packing matches the reference encoding and roundtrips") {
    // reference: (ascii & 6) >> 1 -> A=00 C=01 T=10 G=11
    assert(Packing.pack("A")(0) == 0x00.toByte)
    assert(Packing.pack("C")(0) == 0x40.toByte) // 01 in top bits
    assert(Packing.pack("T")(0) == 0x80.toByte)
    assert(Packing.pack("G")(0) == 0xC0.toByte)
    assert(Packing.pack("ACTG").length == 1)
    assert(Packing.unpackToString(Packing.pack("ACTG"), 4) == "ACTG")
    val rnd = new Random(5)
    for (_ <- 1 to 50) {
      val s = (0 until rnd.nextInt(100)).map(_ => "ACGT"(rnd.nextInt(4))).mkString
      assert(Packing.unpackToString(Packing.pack(s), s.length) == s)
      assert(Packing.pack(s).length == (s.length + 3) / 4)
    }
    // non-ACGT bytes are projected, not rejected (reference behavior):
    // 'E' = 0x45 -> (0x45 & 6) >> 1 = 0b10 = T
    assert(Packing.unpackToString(Packing.pack("E"), 1) == "T")
  }

  test("AlignerCli runs a sequence file end-to-end with reference semantics") {
    val rnd = new Random(7)
    val pairs = (1 to 50).map { _ =>
      val p = (0 until 50 + rnd.nextInt(100)).map(_ => "ACGT"(rnd.nextInt(4))).mkString
      val t = if (rnd.nextBoolean()) {
        val sb = new StringBuilder(p)
        for (_ <- 0 until rnd.nextInt(10) if sb.nonEmpty)
          sb.setCharAt(rnd.nextInt(sb.length), "ACGT"(rnd.nextInt(4)))
        sb.toString
      } else (0 until 50).map(_ => "ACGT"(rnd.nextInt(4))).mkString
      (p, t)
    }
    val path = writeSeqFile(pairs)
    val cfg = AlignerCli.parseArgs(Array("-f", path, "-b", "16", "-d", "64", "-p"))
    assert(cfg.file == path && cfg.batch == 16 && cfg.print)
    val out = AlignerCli.run(spark, cfg).orderBy("pair_id").collect()
    assert(out.length == 50)
    out.foreach { r =>
      val (p, t) = pairs(r.getLong(0).toInt)
      val ref = Levenshtein.distance(p, t)
      if (ref < 64) {
        assert(r.getInt(1) == ref)
        assert(graft.core.CigarOps.replay(p, t, r.getString(3)))
      } else assert(r.getBoolean(2))
    }
    // -n limits the number of alignments
    val limited = AlignerCli.run(spark,
      AlignerCli.parseArgs(Array("-f", path, "-n", "10"))).count()
    assert(limited == 10)

    // long forms parse identically to the reference's arg_handler
    val long = AlignerCli.parseArgs(Array(
      "--file", path, "--num-alignments", "10", "--seq-len", "200",
      "--batch-size", "16", "--cpu-threads", "4", "--max-distance", "32",
      "--print-cigars"))
    assert(long == AlignerCli.Config(path, 10, 200, 16, 4, print = true, band = 32))
  }

  test("-l/--seq-len enforces the reference's 2*len slot capacity, fail-fast") {
    val path = writeSeqFile(Seq(("A" * 100, "A" * 99), ("C" * 401, "C" * 400)))
    // capacity 2*200 = 400: pair 1's 401-byte pattern overflows
    val err = intercept[IllegalArgumentException] {
      AlignerCli.run(spark, AlignerCli.parseArgs(
        Array("-f", path, "-l", "200"))).collect()
    }
    assert(err.getMessage.contains("pair 1") && err.getMessage.contains("400"))
    // exactly at capacity passes; 0/absent means unbounded
    assert(AlignerCli.run(spark, AlignerCli.parseArgs(
      Array("-f", path, "-l", "201"))).count() == 2)
    assert(AlignerCli.run(spark, AlignerCli.parseArgs(
      Array("-f", path))).count() == 2)
  }
}
