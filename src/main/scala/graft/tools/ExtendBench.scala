package graft.tools

import java.util.Arrays

/** Micro-probe for round-2 verdict item 9 ("packed-Long greedy extend,
  * bench-gated"): compares the production extend comparator —
  * `Arrays.mismatch`, HotSpot's vectorizedMismatch intrinsic — against a
  * hand-rolled 8-bytes-per-compare long-XOR + numberOfTrailingZeros loop
  * (the JVM transliteration of the reference's 16-bases-per-u32 XOR+__clz,
  * kernels.cu:27-109), across the run-length mix the ER scorer actually
  * sees: long common runs (near-dup extends) and short runs (junk pairs).
  * The gate is >20% win for the manual loop on the ER mix; results are
  * recorded in BASELINE.md. */
object ExtendBench {

  /** Manual packed-long mismatch: reads 8 bytes a side per iteration via
    * unaligned VarHandle loads, finds the first differing byte with
    * XOR + ntz. Same contract as Arrays.mismatch restricted to the
    * common-prefix use. */
  private val LongAt = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
    classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)

  private def manualMismatch(p: Array[Byte], v0: Int, plen: Int,
                             t: Array[Byte], h0: Int, tlen: Int): Int = {
    val n = math.min(plen - v0, tlen - h0)
    var i = 0
    while (i + 8 <= n) {
      val x = LongAt.get(p, v0 + i).asInstanceOf[Long] ^
        LongAt.get(t, h0 + i).asInstanceOf[Long]
      if (x != 0L) return i + (java.lang.Long.numberOfTrailingZeros(x) >> 3)
      i += 8
    }
    while (i < n) {
      if (p(v0 + i) != t(h0 + i)) return i
      i += 1
    }
    -1
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    // spans: byte arrays with a planted first-mismatch at a controlled run
    // length; offsets randomized so alignment is realistic (diagonal starts
    // are arbitrary relative offsets)
    def mk(run: Int, n: Int): Array[(Array[Byte], Int, Array[Byte], Int)] =
      Array.fill(n) {
        val off1 = rnd.nextInt(8); val off2 = rnd.nextInt(8)
        val a = Array.fill(off1 + run + 64)(('a' + rnd.nextInt(26)).toByte)
        val b = new Array[Byte](off2 + run + 64)
        System.arraycopy(a, off1, b, off2, run + 64)
        b(off2 + run) = (b(off2 + run) ^ 1).toByte // first mismatch at `run`
        (a, off1, b, off2)
      }
    def bench(name: String, spans: Array[(Array[Byte], Int, Array[Byte], Int)],
              reps: Int)(f: (Array[Byte], Int, Int, Array[Byte], Int, Int) => Int): Double = {
      var sum = 0L
      val t0 = System.nanoTime()
      var r = 0
      while (r < reps) {
        var i = 0
        while (i < spans.length) {
          val s = spans(i)
          sum += f(s._1, s._2, s._1.length, s._3, s._4, s._3.length)
          i += 1
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val callsPerSec = spans.length.toLong * reps / sec
      println(f"  $name%-16s ${callsPerSec / 1e6}%8.1f M calls/s (checksum $sum)")
      callsPerSec
    }
    // run-length mix: ER near-dups extend hundreds of bytes between edits
    // (group docs ~300-1500 bytes, <=63 edits); junk pairs mismatch in <4
    for (run <- Seq(2, 8, 32, 128, 512)) {
      val spans = mk(run, 4096)
      val reps = math.max(40000 / run, 100)
      println(s"run-length $run:")
      // warm both paths (JIT) then measure
      for (_ <- 1 to 2) {
        bench("Arrays.mismatch", spans, reps)(Arrays.mismatch(_, _, _, _, _, _))
        bench("manual long-XOR", spans, reps)(manualMismatch(_, _, _, _, _, _))
      }
    }
  }
}
