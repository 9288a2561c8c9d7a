package graft.tools

import graft.core.Hashing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-6 diagnostic: dd03 (minHashPairs) sub-stage wall times at the
  * bench scale. Not driver contract. */
object Dd03Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.driver.host", "127.0.0.1")
      .config("spark.driver.bindAddress", "127.0.0.1")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time(name: String)(f: => Long): Unit = {
      val r1 = { val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n) }
      val r2 = { val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n) }
      println(f"[dd03probe] $name%-22s min=${math.min(r1._1, r2._1)}%6.2fs (r1=${r1._1}%.2f r2=${r2._1}%.2f) rows=${r2._2}")
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val erIn = docs.select(col("doc_id").as("id"), col("text").as("content"))
      .unionAll(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("id"),
          col("text").substr(lit(1), greatest(length(col("text")) - 7, lit(1))).as("content")))
    // signature computation alone (no persist)
    time("sigs_compute") {
      erIn.select(col("id").as[Long], col("content").cast("binary").as[Array[Byte]])
        .map { case (id, bytes) => (id, Hashing.minHashSignature(bytes, 5, 64, 42L)) }
        .toDF("id", "sig").count()
    }
    // full operator
    time("minHashPairs_full") {
      graft.ops.Dedup.minHashPairs(erIn.select(col("id"), col("content")), threshold = 0.5).count()
    }
    spark.stop()
  }
}
