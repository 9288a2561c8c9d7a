package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Pins [[Levenshtein.bitParallel]] (the Myers/Hyyrö blocked bit-vector
  * kernel used by the er04 contract scorer since round 6) to the textbook
  * DP oracle and to the unbanded WFA — all three must agree on every
  * input, because er04's oracle is DuckDB's exact levenshtein().
  * Randomized cases use fixed seeds — fully deterministic. */
class LevenshteinSpec extends AnyFunSuite {

  private def bp(a: String, b: String, ws: LevenshteinWorkspace): Int =
    Levenshtein.bitParallel(a.getBytes("UTF-8"), b.getBytes("UTF-8"), ws)

  private def check(a: String, b: String, ws: LevenshteinWorkspace): Unit = {
    val expect = Levenshtein.distance(a, b)
    val got = bp(a, b, ws)
    assert(got == expect,
      s"bitParallel=$got dp=$expect for |a|=${a.length} |b|=${b.length} " +
        s"a=${a.take(80)} b=${b.take(80)}")
  }

  test("golden edge cases") {
    val ws = new LevenshteinWorkspace()
    check("", "", ws)
    check("", "abc", ws)
    check("abc", "", ws)
    check("a", "a", ws)
    check("a", "b", ws)
    check("abc", "abc", ws)
    check("abc", "abd", ws)
    check("kitten", "sitting", ws)
    check("flaw", "lawn", ws)
    // pure prefix/suffix relations (trim paths)
    check("abcdef", "abc", ws)
    check("def", "abcdef", ws)
    check("xxabcd", "abcd", ws)
    check("abcd", "abcdyy", ws)
  }

  test("block-boundary lengths agree with the DP oracle") {
    val ws = new LevenshteinWorkspace(8) // force growth paths too
    val rnd = new Random(7)
    for (n <- Seq(62, 63, 64, 65, 66, 127, 128, 129, 130, 191, 192, 193, 255, 256, 257)) {
      val a = Array.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Array.fill(n + rnd.nextInt(5) - 2)(('a' + rnd.nextInt(4)).toChar).mkString
      check(a, b, ws)
    }
  }

  test("randomized property: bitParallel == DP on small alphabets") {
    val ws = new LevenshteinWorkspace()
    val rnd = new Random(42)
    for (_ <- 1 to 3000) {
      val n = rnd.nextInt(150)
      val m = rnd.nextInt(150)
      val a = Array.fill(n)(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Array.fill(m)(('a' + rnd.nextInt(3)).toChar).mkString
      check(a, b, ws)
    }
  }

  test("randomized property: bitParallel == DP on mutated near-duplicates") {
    val ws = new LevenshteinWorkspace()
    val rnd = new Random(1234)
    for (_ <- 1 to 500) {
      val n = 50 + rnd.nextInt(500)
      val base = Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
      val sb = new StringBuilder(base)
      val edits = rnd.nextInt(30)
      var e = 0
      while (e < edits && sb.nonEmpty) {
        rnd.nextInt(3) match {
          case 0 => sb.setCharAt(rnd.nextInt(sb.length), ('a' + rnd.nextInt(26)).toChar)
          case 1 => sb.insert(rnd.nextInt(sb.length + 1), ('a' + rnd.nextInt(26)).toChar)
          case 2 => sb.deleteCharAt(rnd.nextInt(sb.length))
        }
        e += 1
      }
      check(base, sb.toString, ws)
    }
  }

  test("randomized property: bitParallel == unbanded WFA (the er04 swap claim)") {
    // er04 runs WFA with band > max(len) + 1 — never saturates, i.e. exact
    // Levenshtein. The round-6 swap to bitParallel must be value-identical.
    val rnd = new Random(99)
    val lws = new LevenshteinWorkspace()
    for (_ <- 1 to 300) {
      val n = rnd.nextInt(300)
      val m = rnd.nextInt(300)
      val a = Array.fill(n)(('a' + rnd.nextInt(8)).toChar).mkString
      val b = Array.fill(m)(('a' + rnd.nextInt(8)).toChar).mkString
      val band = math.max(n, m) + 1
      val wws = new WfaWorkspace(band, withCigar = false)
      val wfa = Wfa.align(a.getBytes("UTF-8"), b.getBytes("UTF-8"), wws)
      assert(!wfa.saturated)
      val got = bp(a, b, lws)
      assert(got == wfa.distance,
        s"bitParallel=$got wfa=${wfa.distance} for a=$a b=$b")
    }
  }

  test("workspace reuse across pairs leaves no stale Peq state") {
    val ws = new LevenshteinWorkspace()
    // 'z'-heavy then 'a'-heavy patterns: stale Peq bits for 'z' would
    // corrupt the second alignment
    check("zzzzzzzzzz", "zzzzzzzzz", ws)
    check("aaaaaaaaaa", "zzzzzzzzzz", ws)
    check("z" * 200, "a" * 200, ws)
    check("a" * 200, ("a" * 100) + ("b" * 100), ws)
  }
}
