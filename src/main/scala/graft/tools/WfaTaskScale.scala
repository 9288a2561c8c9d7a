package graft.tools
import graft.core.{Wfa, WfaWorkspace}
import org.apache.spark.sql.SparkSession
import scala.util.Random

/** WFA throughput inside Spark tasks with task-local data generation —
  * isolates the scorer from cache/shuffle input feeding. */
object WfaTaskScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pairsPerTask = 100000
    val parts = 64
    def run(r: Int): Unit = {
      val t0 = System.nanoTime()
      val n = spark.range(0, parts, 1, parts).mapPartitions { it =>
        it.map { seed =>
          val rnd = new Random(seed)
          val ws = new WfaWorkspace(64, withCigar = false)
          val base = Array.fill(600)(('a' + rnd.nextInt(26)).toByte)
          var sum = 0L
          var i = 0
          while (i < pairsPerTask) {
            val b = base.clone()
            var e = 0
            while (e < rnd.nextInt(30)) { b(rnd.nextInt(b.length)) = ('a' + rnd.nextInt(26)).toByte; e += 1 }
            sum += Wfa.align(base, b, ws).distance
            i += 1
          }
          sum
        }
      }.filter(_ >= 0).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[wts] r$r cpus=$cpus%2d  ${parts.toLong * pairsPerTask / sec}%,.0f pairs/sec (${sec}%.2fs, $n tasks)")
    }
    (1 to 3).foreach(run)
    spark.stop()
  }
}
