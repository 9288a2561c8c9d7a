package graft.oracle

/** Emits DuckDB SQL that reproduces [[graft.core.Hashing]] bit-for-bit, so
  * the LSH operator family (MinHash, SimHash, hyperplane buckets) gets
  * value-level DuckDB oracles instead of rows-only checks (round-1
  * verdict). Wrapping 64-bit arithmetic is done in UHUGEINT (uint128) and
  * reduced mod 2^64; signed-Long semantics (comparisons, toDouble) are
  * recovered explicitly. All emitted SQL is a single statement (CTEs +
  * DuckDB lateral column aliases — no macros), because the driver executes
  * each oracle as one statement.
  *
  * Validated bit-for-bit against graft.core.Hashing by the driver gate
  * (dd03/dd04/er08/ann02 value-level rows at sf0.001 and sf0.01 — see
  * tools/check_oracle.py).
  */
object DuckHash {

  // mod 2^64 via bitwise AND with 2^64-1: identical for unsigned values,
  // and ~90x faster — DuckDB does not strength-reduce `%` by a 128-bit
  // constant (measured 27.8 s vs 0.3 s for the full signature chain)
  private val Mask = "CAST(18446744073709551615 AS UHUGEINT)" // 2^64 - 1

  /** (a * b) mod 2^64 on UBIGINT expressions. */
  def mulw(a: String, b: String): String =
    s"CAST((CAST($a AS UHUGEINT) * CAST($b AS UHUGEINT)) & $Mask AS UBIGINT)"

  /** (a + b) mod 2^64 on UBIGINT expressions. */
  def addw(a: String, b: String): String =
    s"CAST((CAST($a AS UHUGEINT) + CAST($b AS UHUGEINT)) & $Mask AS UBIGINT)"

  /** splitmix64 staged one step per NESTED SUBQUERY level — constant work
    * per row. (Lateral aliases are substituted textually by DuckDB, so a
    * whole splitmix in one select list costs ~8x its input expression;
    * fine for small row counts, ruinous on the 20M-row signature chain.)
    * `carry` columns pass through; the result column is `outCol`;
    * `from` is a table/CTE name or parenthesized subquery. */
  def splitmixNested(from: String, in: String, carry: Seq[String], outCol: String): String = {
    val cs = carry.mkString(", ")
    s"""SELECT $cs, xor(s3, s3 >> 31) AS $outCol FROM (
       |  SELECT $cs, ${mulw("xor(s2, s2 >> 27)", "10723151780598845931")} AS s3 FROM (
       |    SELECT $cs, ${mulw("xor(s1, s1 >> 30)", "13787848793156543929")} AS s2 FROM (
       |      SELECT $cs, ${addw(in, "11400714819323198485")} AS s1 FROM $from)))""".stripMargin
  }

  /** splitmix64 staged through lateral aliases `<p>1..<p>3`; the returned
    * SELECT-list fragment's final (unaliased) expression is the result.
    * Only for SMALL row counts — see [[splitmixNested]].
    * Matches Hashing.splitmix64 (Steele et al., OOPSLA'14 finalizer). */
  def splitmixCols(in: String, p: String): String =
    s"""${addw(in, "11400714819323198485")} AS ${p}1,
       |    ${mulw(s"xor(${p}1, ${p}1 >> 30)", "13787848793156543929")} AS ${p}2,
       |    ${mulw(s"xor(${p}2, ${p}2 >> 27)", "10723151780598845931")} AS ${p}3,
       |    xor(${p}3, ${p}3 >> 31)""".stripMargin

  /** FNV-1a fold (Hashing.hashBytes pre-mix) unrolled over the fixed-width
    * `k`-byte shingle of 1-indexed `col` starting at lateral column `i`.
    * Valid only while every document is at least `k` chars (min content
    * length 47 in the driver testdata) and pure ASCII (asserted by the
    * Spark side), so ord(char) == UTF-8 byte. */
  def fnvShingle(col: String, k: Int, seed: Long): String = {
    var h = s"CAST(xor(CAST($seed AS UBIGINT), CAST(14695981039346656037 AS UBIGINT)) AS UBIGINT)"
    for (p <- 0 until k)
      h = mulw(s"xor($h, CAST(ord(substr($col, i + $p, 1)) AS UBIGINT))", "1099511628211")
    h
  }

  /** FNV-1a + splitmix64 over a variable-length ASCII string expression
    * (Hashing.hashString pre-mix as a list_reduce fold); returns the
    * pre-splitmix UBIGINT — pipe through [[splitmixCols]]. */
  def fnvString(col: String, seed: Long): String =
    s"""list_reduce(
       |      list_prepend(CAST(xor(CAST($seed AS UBIGINT), CAST(14695981039346656037 AS UBIGINT)) AS UBIGINT),
       |        list_transform(range(1, length($col) + 1), ci -> CAST(ord(substr($col, ci, 1)) AS UBIGINT))),
       |      (acc, bb) -> ${mulw("xor(acc, bb)", "1099511628211")})""".stripMargin

  /** Reinterpret a UBIGINT expression as signed-Long HUGEINT (two's
    * complement), for Scala `Long` comparisons / `toDouble`. */
  def toSigned(x: String): String =
    s"(CAST($x AS HUGEINT) - CASE WHEN $x >= CAST(9223372036854775808 AS UBIGINT) THEN CAST(18446744073709551616 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"

  /** Signed-order MIN over a UBIGINT aggregate input: flip the sign bit,
    * take the unsigned min, flip back (Scala compares signatures as
    * signed Longs). */
  def signedMin(x: String): String =
    s"xor(min(xor($x, CAST(9223372036854775808 AS UBIGINT))), CAST(9223372036854775808 AS UBIGINT))"

  /** CTE chain `<out>` = (id, sig UBIGINT[numHashes]) reproducing
    * Hashing.minHashSignature over char 5-shingles of `corpusCte`(id,
    * content). Emits CTE definitions only (caller appends to a WITH). */
  def minhashSigsCtes(corpusCte: String, numHashes: Int, seed: Long,
                      out: String): String = {
    val jmix = addw(seed.toString, mulw("6364136223846793005", "CAST(j + 1 AS UBIGINT)"))
    s"""${out}_sh AS (
       |  SELECT id, ${fnvShingle("content", 5, seed)} AS fv
       |  FROM $corpusCte, unnest(range(1, greatest(length(content) - 4, 1) + 1)) t(i)),
       |${out}_shb AS (
       |  ${splitmixNested(s"${out}_sh", "fv", Seq("id"), "base")}),
       |${out}_hj AS (
       |  ${splitmixNested(
            s"""(SELECT id, j, xor(base, $jmix) AS y0
               |   FROM ${out}_shb, unnest(range(0, $numHashes)) t(j))""".stripMargin,
            "y0", Seq("id", "j"), "h")}),
       |${out}_sigj AS (
       |  SELECT id, j, ${signedMin("h")} AS s
       |  FROM ${out}_hj GROUP BY 1, 2),
       |$out AS MATERIALIZED (SELECT id, list(s ORDER BY j) AS sig FROM ${out}_sigj GROUP BY id)""".stripMargin
  }

  /** CTE `<out>` = (id, b, bhash) — LSH banding over `sigsCte`(id, sig):
    * h = GOLDEN * (b+1); r times h = splitmix64(h XOR sig[b*r + s]).
    *
    * One splitmix64 stage per NESTED SUBQUERY level, never chained through
    * lateral aliases in one select list: DuckDB substitutes lateral
    * aliases textually, so chaining k stages in one level grows the
    * expression tree ~8^k (measured: 5.7 s/evaluation at r=4 vs
    * milliseconds staged). The result is MATERIALIZED — DuckDB inlines
    * plain CTEs, re-evaluating this chain once per downstream reference. */
  def bandHashCtes(sigsCte: String, numHashes: Int, bands: Int, out: String): String = {
    val r = numHashes / bands
    var inner =
      s"""SELECT id, sig, b, ${mulw("11400714819323198485", "CAST(b + 1 AS UBIGINT)")} AS g0
         |FROM $sigsCte, unnest(range(0, $bands)) t(b)""".stripMargin
    for (s <- 0 until r) {
      inner =
        s"""SELECT id, sig, b,
           |    ${splitmixCols(s"xor(g$s, sig[b * $r + ${s + 1}])", s"g${s}s")} AS g${s + 1}
           |FROM ($inner)""".stripMargin
    }
    s"""$out AS MATERIALIZED (
       |  SELECT id, b, g$r AS bhash FROM ($inner))""".stripMargin
  }

  /** CTE chain `<out>` = (id, simhash UBIGINT) reproducing
    * Hashing.simHash64 over whitespace tokens of `corpusCte`(id, content).
    * Zero-token documents (all-whitespace content) never reach the vote
    * CTE, so the final CTE left-joins every corpus id back with
    * COALESCE(simhash, 0) — Hashing.simHash64 returns 0L for them
    * (round-2 advice: an all-whitespace doc silently desynced the oracle). */
  def simhashCtes(corpusCte: String, seed: Long, out: String): String =
    s"""${out}_tok AS (
       |  SELECT id, tok
       |  FROM $corpusCte,
       |    unnest(list_filter(string_split_regex(content, '[ \\n\\t]'), t -> t <> '')) u(tok)),
       |${out}_th AS (
       |  SELECT id, ${fnvString("tok", seed)} AS f
       |  FROM ${out}_tok),
       |${out}_thm AS (SELECT id, ${splitmixCols("f", "x")} AS h FROM ${out}_th),
       |${out}_votes AS (
       |  SELECT id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM ${out}_thm, unnest(range(0, 64)) t(b) GROUP BY 1, 2),
       |${out}_agg AS (
       |  SELECT id,
       |    CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
       |  FROM ${out}_votes GROUP BY id),
       |$out AS MATERIALIZED (
       |  SELECT c.id, COALESCE(a.simhash, CAST(0 AS UBIGINT)) AS simhash
       |  FROM $corpusCte c LEFT JOIN ${out}_agg a ON a.id = c.id)""".stripMargin

  /** CTE chain `<out>` = (vec_id, tbl, bucket) reproducing
    * Hashing.hyperplaneBucket (+ tableSeed) over `embCte`(vec_id,
    * v DOUBLE[dim]). The dot product is a sequential list_reduce in dim
    * order — the same IEEE addition sequence as the Scala fold. */
  def hyperplaneBucketCtes(embCte: String, dim: Int, nPlanes: Int,
                           nTables: Int, seed: Long, out: String): String = {
    val tseed = addw(seed.toString, mulw("6364136223846793005", "CAST(tbl + 1 AS UBIGINT)"))
    s"""${out}_ts AS (  -- per-table seed: splitmix64(seed + C * (t+1))
       |  SELECT tbl, ${splitmixCols(tseed, "w")} AS tseed
       |  FROM unnest(range(0, $nTables)) t(tbl)),
       |${out}_ps AS (  -- per-plane seed: splitmix64(tseed + GOLDEN * (p+1))
       |  SELECT tbl, p, ${splitmixCols(addw("tseed", mulw("11400714819323198485", "CAST(p + 1 AS UBIGINT)")), "q")} AS sp
       |  FROM ${out}_ts, unnest(range(0, $nPlanes)) t(p)),
       |${out}_comp AS (  -- component(p, i) = splitmix64(sp XOR (i+1)) as signed / 2^63
       |  SELECT tbl, p, i, ${splitmixCols("xor(sp, CAST(i + 1 AS UBIGINT))", "r")} AS h,
       |    CAST(${toSigned("h")} AS DOUBLE) / CAST(9223372036854775807 AS DOUBLE) AS c
       |  FROM ${out}_ps, unnest(range(0, $dim)) t(i)),
       |${out}_comps AS (SELECT tbl, p, list(c ORDER BY i) AS cl FROM ${out}_comp GROUP BY 1, 2),
       |${out}_dots AS (
       |  SELECT vec_id, tbl, p,
       |    list_reduce(list_transform(range(1, $dim + 1), i -> v[i] * cl[i]), (a, x) -> a + x) AS dot
       |  FROM $embCte, ${out}_comps),
       |$out AS MATERIALIZED (
       |  SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN dot >= 0 THEN CAST(1 AS UBIGINT) << p ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS bucket
       |  FROM ${out}_dots GROUP BY 1, 2)""".stripMargin
  }
}
