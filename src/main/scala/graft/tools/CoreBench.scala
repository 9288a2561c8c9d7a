package graft.tools

import graft.core.{Wfa, WfaWorkspace}
import graft.pipeline.Corpus
import scala.util.Random

/** Pure-JVM scorer microbenchmark: single-thread and multi-thread WFA
  * throughput without Spark (the compute ceiling the distributed stage
  * should approach). */
object CoreBench {
  def main(args: Array[String]): Unit = {
    val nPairs = 200000
    val rnd = new Random(42)
    val gen = Corpus.GenConfig()
    // realistic pair mix: ~80% near-dups from the same group, 20% cross junk
    val groups = (0 until 4000).map(g => Corpus.groupMembers(g, gen))
    val pairs = new Array[(Array[Byte], Array[Byte])](nPairs)
    var i = 0
    while (i < nPairs) {
      val g = groups(rnd.nextInt(groups.length))
      val a = g(rnd.nextInt(g.length)).content.getBytes("UTF-8")
      val b =
        if (rnd.nextInt(5) == 0)
          groups(rnd.nextInt(groups.length))(0).content.getBytes("UTF-8")
        else g(rnd.nextInt(g.length)).content.getBytes("UTF-8")
      pairs(i) = (a, b)
      i += 1
    }
    def run(threads: Int): Unit = {
      val t0 = System.nanoTime()
      val total = new java.util.concurrent.atomic.AtomicLong()
      val ts = (0 until threads).map { t =>
        new Thread(() => {
          val ws = new WfaWorkspace(64, withCigar = false)
          var sum = 0L
          var j = t
          while (j < nPairs) {
            sum += Wfa.align(pairs(j)._1, pairs(j)._2, ws).distance
            j += threads
          }
          total.addAndGet(sum)
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[core] threads=$threads%2d  ${nPairs / sec}%,.0f pairs/sec  (${sec}%.2fs, checksum=${total.get()})")
    }
    run(1); run(1); run(8); run(32)
  }
}
