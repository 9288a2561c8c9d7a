package graft.core

/** Textbook O(n*m) two-row DP unit-cost Levenshtein. Test oracle for the
  * WFA scorer (cross-check per SURVEY.md §5.2), mirroring the role of the
  * reference's DEBUG_MODE CPU check (/root/reference/src/wavefront.cu:302-320).
  */
object Levenshtein {
  def distance(a: Array[Byte], b: Array[Byte]): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      curr(0) = i
      val ai = a(i - 1)
      j = 1
      while (j <= m) {
        val cost = if (ai == b(j - 1)) 0 else 1
        var best = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < best) best = del
        val ins = curr(j - 1) + 1
        if (ins < best) best = ins
        curr(j) = best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m)
  }

  def distance(a: String, b: String): Int =
    distance(a.getBytes("UTF-8"), b.getBytes("UTF-8"))
}
