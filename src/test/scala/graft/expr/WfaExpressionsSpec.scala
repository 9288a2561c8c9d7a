package graft.expr

import graft.core.Levenshtein
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL + Column surface of the WFA scorer (extension-registered native
  * expressions, codegen path). */
class WfaExpressionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-expr-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("wfa_distance in SQL matches the DP oracle; saturation at band") {
    import spark.implicits._
    val df = Seq(
      ("ACGT", "ACGT"), ("ACGT", "ATGT"), ("", "AC"), ("kitten", "sitting"),
      ("A" * 100, "C" * 100)
    ).toDF("p", "t")
    df.createOrReplaceTempView("pairs_v")
    val rows = spark.sql(
      "SELECT p, t, wfa_distance(p, t, 64) AS d, wfa_cigar(p, t, 64) AS c FROM pairs_v")
      .collect()
    rows.foreach { r =>
      val (p, t, d) = (r.getString(0), r.getString(1), r.getInt(2))
      val ref = Levenshtein.distance(p, t)
      if (ref < 64) {
        assert(d == ref)
        assert(graft.core.CigarOps.replay(p, t, r.getString(3)) || (p.isEmpty && t.isEmpty))
      } else {
        assert(d == 64 && r.isNullAt(3))
      }
    }
  }

  test("Column API via call_function; nulls propagate") {
    import spark.implicits._
    val df = Seq((Some("ACGT"), Some("ACCT")), (None, Some("A")), (Some("A"), None))
      .toDF("p", "t")
    val got = df.select(functions.wfa_distance(col("p"), col("t"), lit(32)).as("d"))
      .collect()
    assert(got(0).getInt(0) == 1)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("wfa_distance survives whole-stage codegen over many rows") {
    import spark.implicits._
    val n = 5000
    val df = spark.range(n).select(
      concat(lit("prefix_"), col("id").cast("string")).as("p"),
      concat(lit("prefix_"), ((col("id") + 1) % n).cast("string")).as("t"))
    val total = df.select(functions.wfa_distance(col("p"), col("t"), lit(16)).as("d"))
      .agg(sum("d")).head().getLong(0)
    assert(total > 0)
    // plan stays in WholeStageCodegen: the "*(n)" prefix marks codegen'd
    // spans in the simple plan string
    val plan = df.select(functions.wfa_distance(col("p"), col("t"), lit(16)))
      .queryExecution.executedPlan.toString
    assert(plan.trim.startsWith("*("), plan)
  }

  test("type mismatch is rejected at analysis") {
    import spark.implicits._
    val df = Seq((1, 2)).toDF("p", "t")
    val e = intercept[Exception] {
      df.select(functions.wfa_distance(col("p"), col("t"), lit(8))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("wfa_distance"))
  }

  test("wrong arity is an analysis error, not a silent drop or index crash") {
    import org.apache.spark.sql.AnalysisException
    // 3-arg call to a 2-arg function: previously children(2) was silently
    // DROPPED (the call "worked" on the first two args); 0-arg call:
    // previously IndexOutOfBoundsException from children.head
    for (sql <- Seq(
        "SELECT l2sq_int(array(1L), array(1L), array(1L))",
        "SELECT splitmix64()",
        "SELECT cosine_sim(array(1.0d))",
        "SELECT wfa_distance('a', 'b')")) {
      val e = intercept[AnalysisException](spark.sql(sql).collect())
      assert(e.getMessage.contains("requires"), s"$sql -> ${e.getMessage}")
    }
  }
}
