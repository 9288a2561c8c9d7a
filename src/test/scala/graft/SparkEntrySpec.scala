package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() returns rows; every query runs on
  * sf0.001; oracle keys are a subset of query keys. (Value-level oracle
  * parity is checked by the driver's DuckDB gate and locally via
  * tools/check_oracle.py.) */
class SparkEntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry: flagship ER pipeline returns non-singleton entities") {
    val out = SparkEntry.entry(spark)
    val n = out.count()
    assert(n > 0, "flagship must produce clustered entities")
    // planted near-dups: ~100 pairs at sf0.001 -> expect >= 80 clusters
    assert(n >= 80, s"expected >=80 clusters from planted dups, got $n")
  }

  test("all queries run on sf0.001 and the oracle map is consistent") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val rows = fn(spark, dir).count()
      withClue(s"$name: ") {
        assert(rows >= 0)
        if (name != "dd05_embedding_neardup") // legitimately small/empty-able
          assert(rows > 0, s"$name returned no rows")
      }
    }
    val unknown = SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracleSql keys without queries: $unknown")
    // since round 2 EVERY query is oracle-checked — no rows-only checks left
    val unoracled = SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without a DuckDB oracle: $unoracled")
    // the driver executes each oracle as ONE statement — no statement
    // separators outside string literals (txt01's punctuation regex
    // legitimately contains ';' inside quotes)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      val stripped = sql
        .replaceAll("'(?:[^']|'')*'", "''") // string literals
        .replaceAll("--[^\n]*", "")         // line comments
      assert(!stripped.contains(";"), s"$name oracle must be a single statement")
    }
  }
}
