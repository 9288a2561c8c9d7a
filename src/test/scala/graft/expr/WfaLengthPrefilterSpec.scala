package graft.expr

import graft.SparkTestBase
import graft.core.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: implied length-gap predicate appears
  * first in the filter, is NOT injected when saturation makes it unsound,
  * and never changes results. */
class WfaLengthPrefilterSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // Range-backed (a local Seq is folded away by ConvertToLocalRelation,
  // which would evaluate the filter at optimization time and hide the
  // rewrite under test); lengths vary so the prefilter actually prunes
  private lazy val pairs = spark.range(200).select(
    rpad(lit("x"), (col("id") % 60 + 5).cast("int"), lit("x")).as("p"),
    when(col("id") % 3 === 0,
        rpad(lit("x"), (col("id") % 60 + 7).cast("int"), lit("x")))
      .otherwise(rpad(lit("x"), (col("id") % 37 + 5).cast("int"), lit("y"))).as("t"))

  test("tau < band: the cheap length predicate is prepended to the filter") {
    val q = pairs.where(functions.wfa_distance(col("p"), col("t"), lit(64)) <= 10)
    // column pruning may push the filter below the project, substituting
    // p/t with their defining expressions — match on the injected shape
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((octet_length(") && optimized.contains("<= 10"), optimized)
    // short-circuit order: the length predicate precedes the WFA call
    val cond = optimized.linesIterator.find(_.contains("Filter")).get
    assert(cond.indexOf("abs((octet_length") < cond.indexOf("wfa_distance"), cond)
  }

  test("tau >= band would accept saturated rows: no injection") {
    val q = pairs.where(functions.wfa_distance(col("p"), col("t"), lit(8)) <= 8)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("abs((octet_length"), optimized)
  }

  test("strict < is sound at tau == band and injects") {
    val q = pairs.where(functions.wfa_distance(col("p"), col("t"), lit(8)) < 8)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((octet_length"), optimized)
  }

  test("results are unchanged by the rewrite (vs DP-oracle filter)") {
    val got = pairs.where(functions.wfa_distance(col("p"), col("t"), lit(64)) <= 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = pairs.collect().map(r => (r.getString(0), r.getString(1)))
      .filter { case (p, t) => Levenshtein.distance(p, t) <= 10 }.toSet
    assert(got == expected && got.nonEmpty)
  }
}
