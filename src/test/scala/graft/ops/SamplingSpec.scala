package graft.ops

import graft.SparkTestBase
import graft.core.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-gated stratified sampling: exact gate parity with
  * core.Hashing, partitioning-stability (the property df.sample lacks),
  * rate edge cases, and the codegen plan shape. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val rows = Seq.tabulate(2000)(i =>
    (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
  private val df = rows.toDF("doc_id", "lang")

  private def expectedIds(rates: Map[String, Int], default: Int, seed: Long) =
    rows.filter { case (id, lang) =>
      (Hashing.splitmix64(id ^ seed) & 1023L) < rates.getOrElse(lang, default)
    }.map(_._1).toSet

  test("survivors are exactly the splitmix64-gated set") {
    val rates = Map("en" -> 256, "zh" -> 768)
    val got = Sampling.stratified(df, "doc_id", "lang", rates, 512)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expectedIds(rates, 512, 42L))
    assert(got.nonEmpty && got.size < rows.size)
  }

  test("survivor set is invariant under repartitioning (unlike df.sample)") {
    val rates = Map("en" -> 300)
    val a = Sampling.stratified(df.repartition(1), "doc_id", "lang", rates, 512)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(df.repartition(13), "doc_id", "lang", rates, 512)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
  }

  test("rate 0 drops a stratum entirely; rate 1024 keeps it entirely") {
    val got = Sampling.stratified(df, "doc_id", "lang",
      Map("en" -> 0, "zh" -> 1024), 0).select("doc_id", "lang").collect()
    assert(got.forall(_.getString(1) == "zh"))
    assert(got.length == rows.count(_._2 == "zh"))
  }

  test("observed rates track the per-1024 targets") {
    val rates = Map("en" -> 256, "zh" -> 768)
    val byLang = Sampling.stratified(df, "doc_id", "lang", rates, 512)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = rows.groupBy(_._2).view.mapValues(_.size).toMap
    for ((lang, kept) <- byLang) {
      val target = rates.getOrElse(lang, 512) / 1024.0
      val observed = kept.toDouble / totals(lang)
      assert(math.abs(observed - target) < 0.08, s"$lang: $observed vs $target")
    }
  }

  test("quota: exactly n per stratum, the n unsigned-smallest hashes, repartition-stable") {
    val n = 17
    val got = Sampling.quotaPerStratum(df, "doc_id", "lang", n)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // driver-side reference: sort each stratum by (unsigned hash, id)
    val expected = rows.groupBy(_._2).view.mapValues { xs =>
      xs.map(_._1).sortBy(id =>
        (Hashing.splitmix64(id ^ 42L) ^ Long.MinValue, id)).take(n).toSet
    }.toMap
    assert(byLang == expected)
    assert(byLang.values.forall(_.size == n))
    val again = Sampling.quotaPerStratum(df.repartition(13), "doc_id", "lang", n)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got.map(_._1).toSet)
  }

  test("splitAssign: disjoint+exhaustive, repartition-stable, cross-table consistent") {
    import spark.implicits._
    val splits = Seq("train" -> 820, "val" -> 102, "test" -> 102)
    val rows = (0L until 3000L).map(i => (i, s"d$i"))
    def assign(parts: Int) =
      Sampling.splitAssign(rows.toDF("id", "v").repartition(parts), "id", splits)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = assign(2)
    assert(a.keySet.size == 3000, "exhaustive: every row labeled exactly once")
    assert(a == assign(11), "repartition-stable")
    // same ids in a DIFFERENT table split identically (no cross-table leakage)
    val other = Sampling.splitAssign(
        rows.map { case (i, _) => (i, i * 2) }.toDF("id", "w"), "id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == other)
    // observed proportions track the 820/102/102 weights
    val n = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(n("train") - 3000.0 * 820 / 1024) < 120)
    assert(math.abs(n("val") - 3000.0 * 102 / 1024) < 60)
    assert(math.abs(n("test") - 3000.0 * 102 / 1024) < 60)
  }

  test("splitAssign rejects bad inputs loudly") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, "id", Seq("a" -> 512, "b" -> 500)))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, "id", Seq.empty))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(Seq((1L, "x")).toDF("id", "split"), "id",
        Seq("a" -> 1024)))
  }

  test("non-integral id columns are rejected; null ids raise, never hash to null") {
    val strDf = Seq(("a", "en")).toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.stratified(strDf, "doc_id", "lang", Map.empty, 512)
    }
    assert(e.getMessage.contains("integral"))
    val nullDf = Seq((Some(1L), "en"), (None, "en")).toDF("doc_id", "lang")
    val err = intercept[Exception] {
      Sampling.quotaPerStratum(nullDf, "doc_id", "lang", 1).collect()
    }
    assert(err.getMessage.contains("null id"))
  }

  test("working-column name collisions fail loudly instead of clobbering") {
    val d = Seq((1L, "en", 9L)).toDF("doc_id", "lang", "_samp_h")
    val e = intercept[IllegalArgumentException] {
      Sampling.quotaPerStratum(d, "doc_id", "lang", 1)
    }
    assert(e.getMessage.contains("_samp_h"))
  }

  test("quota larger than a stratum keeps the whole stratum") {
    val tiny = Seq((1L, "en"), (2L, "en"), (3L, "zh")).toDF("doc_id", "lang")
    val got = Sampling.quotaPerStratum(tiny, "doc_id", "lang", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("globalShuffleRank is the exact global unsigned-hash rank; repartition-stable") {
    // sparse, sign-crossing ids so the arithmetic-shift bucketing and the
    // unsigned sort order are both genuinely exercised
    val rnd = new scala.util.Random(3)
    val ids = (Seq.tabulate(500)(_ => rnd.nextLong()) ++ Seq(0L, -1L, Long.MaxValue,
      Long.MinValue + 1)).distinct
    val d = ids.map(i => (i, s"r$i")).toDF("doc_id", "payload")
    val got = Sampling.globalShuffleRank(d, "doc_id", seed = 9L, buckets = 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    val expected = ids
      .sortBy(i => (graft.core.Hashing.splitmix64(i ^ 9L) ^ Long.MinValue, i))
      .zipWithIndex.map { case (i, p) => i -> p.toLong }.toMap
    assert(got == expected)
    // every position exactly once (the stitching can't duplicate or gap)
    assert(got.values.toSeq.sorted == ids.indices.map(_.toLong))
    val re = Sampling.globalShuffleRank(d.repartition(13), "doc_id", seed = 9L, buckets = 16)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    assert(re == expected, "rank must be partition-invariant")
  }

  test("tokenBudgetPerStratum matches a sequential greedy walk; repartition-stable") {
    // deterministic varied token counts; budget chosen to cut every stratum
    // mid-way so the stitched cumsum is exercised across bucket boundaries
    val toks = rows.map { case (id, lang) => (id, lang, (id % 37L) + 1L) }
    val d = toks.toDF("doc_id", "lang", "n_tokens")
    val budget = 600L
    val got = Sampling.tokenBudgetPerStratum(d, "doc_id", "lang", "n_tokens",
      budget, seed = 42L, buckets = 16)
      .select("doc_id", "tokens_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side reference: per stratum, walk ascending (unsigned hash, id)
    // keeping rows while the running total BEFORE the row is under budget
    val expected = toks.groupBy(_._2).values.flatMap { xs =>
      val sorted = xs.sortBy { case (id, _, _) =>
        (Hashing.splitmix64(id ^ 42L) ^ Long.MinValue, id)
      }
      var cum = 0L
      sorted.flatMap { case (id, _, t) =>
        val keep = if (cum < budget) Some(id -> cum) else None
        cum += t
        keep
      }
    }.toMap
    assert(got == expected)
    // the crossing row is kept: some survivor has tokens_before + n_tokens > budget
    val crossed = got.exists { case (id, before) => before + ((id % 37L) + 1L) > budget }
    assert(crossed, "budget must cut at least one stratum mid-row")
    val re = Sampling.tokenBudgetPerStratum(d.repartition(13), "doc_id", "lang",
      "n_tokens", budget, seed = 42L, buckets = 16)
      .select("doc_id", "tokens_before").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == expected, "survivor set must be partition-invariant")
  }

  test("tokenBudget: every non-empty stratum contributes at least one row") {
    // one giant doc per stratum, far over budget — greedy keeps the first row
    val d = Seq((1L, "en", 999999L), (2L, "zh", 999999L)).toDF("doc_id", "lang", "n_tokens")
    val got = Sampling.tokenBudgetPerStratum(d, "doc_id", "lang", "n_tokens", 100L)
      .select("lang").as[String].collect().toSet
    assert(got == Set("en", "zh"))
  }

  test("tokenBudget rejects bad inputs loudly") {
    val d = Seq((1L, "en", 5L)).toDF("doc_id", "lang", "n_tokens")
    assert(intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerStratum(d, "doc_id", "lang", "n_tokens", 0L)
    }.getMessage.contains("budget"))
    assert(intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerStratum(d, "doc_id", "lang", "n_tokens", 10L, buckets = 3)
    }.getMessage.contains("power of two"))
    val dbl = Seq((1L, "en", 5.0)).toDF("doc_id", "lang", "n_tokens")
    assert(intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerStratum(dbl, "doc_id", "lang", "n_tokens", 10L)
    }.getMessage.contains("integral"))
    val neg = Seq((1L, "en", -5L)).toDF("doc_id", "lang", "n_tokens")
    val e = intercept[Exception] {
      Sampling.tokenBudgetPerStratum(neg, "doc_id", "lang", "n_tokens", 10L).collect()
    }
    assert(e.getMessage.contains(">= 0"))
    val clash = Seq((1L, "en", 5L, 0L)).toDF("doc_id", "lang", "n_tokens", "tokens_before")
    assert(intercept[IllegalArgumentException] {
      Sampling.tokenBudgetPerStratum(clash, "doc_id", "lang", "n_tokens", 10L)
    }.getMessage.contains("tokens_before"))
  }

  test("the gate stays inside whole-stage codegen (native expression, no UDF)") {
    // a Range-backed frame: a local Seq collapses to LocalTableScan via
    // ConvertToLocalRelation, hiding the codegen span under test
    val ranged = spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") % 3 === 0, "en").otherwise("de").as("lang"))
    val plan = Sampling.stratified(ranged, "doc_id", "lang", Map("en" -> 256), 512)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke"), plan)
    assert(plan.trim.startsWith("*("), plan)
  }
}
