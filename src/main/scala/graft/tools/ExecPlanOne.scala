package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes one declared query and prints its EXECUTED plan's join /
  * exchange / reuse lines (round-6 diagnostic; PlanCheck runs the full
  * audit, this runs one query fast). Usage: ExecPlanOne <sfDir> <name...> */
object ExecPlanOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    for (q <- args.drop(1)) {
      println(s"===== $q")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.collect()
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Exchange") || l.contains("Join") ||
          l.contains("Reused") || l.contains("InMemory"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
