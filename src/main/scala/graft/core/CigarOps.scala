package graft.core

/** CIGAR utilities: the correctness oracle re-expressing the reference's
  * `check_cigar` (/root/reference/src/wavefront.cuh:297-419): replaying a
  * run-length CIGAR against the original pair must (a) match char-by-char on
  * 'M' runs, (b) mismatch on 'X', (c) consume text on 'I' and pattern on 'D',
  * and (d) consume exactly plen and tlen; additionally the op-count invariant
  * #(X)+#(I)+#(D) == distance must hold (the replay loop of
  * /root/reference/src/wavefront.cuh:201 executes exactly `distance` ops).
  */
object CigarOps {

  final case class Counts(m: Long, x: Long, i: Long, d: Long) {
    def edits: Long = x + i + d
  }

  /** Parse "12M1X3M1D" into (count, op) pairs. Throws on malformed input. */
  def parse(cigar: String): Seq[(Int, Char)] = {
    val out = Seq.newBuilder[(Int, Char)]
    var i = 0
    val n = cigar.length
    while (i < n) {
      var c = 0
      val start = i
      while (i < n && cigar.charAt(i).isDigit) { c = c * 10 + (cigar.charAt(i) - '0'); i += 1 }
      require(i > start && i < n, s"malformed CIGAR at $i: $cigar")
      val op = cigar.charAt(i)
      require(op == 'M' || op == 'X' || op == 'I' || op == 'D', s"bad op $op in $cigar")
      require(c > 0, s"zero run in $cigar")
      out += ((c, op))
      i += 1
    }
    out.result()
  }

  def counts(cigar: String): Counts = {
    var m = 0L; var x = 0L; var ii = 0L; var dd = 0L
    parse(cigar).foreach {
      case (c, 'M') => m += c
      case (c, 'X') => x += c
      case (c, 'I') => ii += c
      case (c, 'D') => dd += c
      case _        => ()
    }
    Counts(m, x, ii, dd)
  }

  /** Replay `cigar` against (pattern, text); true iff the alignment is
    * valid and fully consumes both sequences. */
  def replay(pattern: Array[Byte], text: Array[Byte], cigar: String): Boolean = {
    var v = 0
    var h = 0
    val plen = pattern.length
    val tlen = text.length
    try {
      parse(cigar).foreach { case (c, op) =>
        op match {
          case 'M' =>
            var j = 0
            while (j < c) {
              if (v >= plen || h >= tlen || pattern(v) != text(h)) return false
              v += 1; h += 1; j += 1
            }
          case 'X' =>
            var j = 0
            while (j < c) {
              if (v >= plen || h >= tlen || pattern(v) == text(h)) return false
              v += 1; h += 1; j += 1
            }
          case 'I' => h += c; if (h > tlen) return false
          case 'D' => v += c; if (v > plen) return false
        }
      }
    } catch { case _: IllegalArgumentException => return false }
    v == plen && h == tlen
  }

  def replay(pattern: String, text: String, cigar: String): Boolean =
    replay(pattern.getBytes("UTF-8"), text.getBytes("UTF-8"), cigar)
}
