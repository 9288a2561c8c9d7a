package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Document-corpus sources/sinks beyond Parquet: JSONL (the lingua franca
  * of training-data pipelines) and CSV. Both read with a FIXED schema —
  * schema inference over an unbounded corpus is a full extra pass of the
  * data, so at 100 TB the schema is a contract, not a discovery
  * (`spark.read.schema(...)`, never `inferSchema`). Writers emit the same
  * shape, so a corpus round-trips losslessly through either format
  * (DocumentIOSpec pins the round-trip byte-for-byte). */
object DocumentIO {

  /** The ER corpus contract (SURVEY.md §1.2 input_hint mapping). */
  val docSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("repo", StringType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("commit", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  private def ordered(df: DataFrame): DataFrame =
    df.select(docSchema.fieldNames.map(org.apache.spark.sql.functions.col): _*)

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(docSchema).json(path)

  def writeJsonl(df: DataFrame, path: String,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    ordered(df).write.mode(mode).json(path)

  /** CSV with a header and full quoting/escaping — source code content
    * contains commas, quotes and newlines, all of which must survive.
    * SCALE CAVEAT: multiLine=true (required for quoted newlines) makes
    * each CSV file a single input split, so parallelism is bounded by
    * file count. Prefer JSONL (line-splittable) or Parquet for large
    * corpora; CSV is an interchange convenience. */
  // explicit null sentinel so empty string and null both round-trip (the
  // CSV reader's default maps empty fields to null)
  private val CsvNull = "\\N"

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(docSchema)
      .option("header", "true")
      .option("multiLine", "true") // quoted newlines inside content
      .option("escape", "\"")
      .option("nullValue", CsvNull)
      .option("emptyValue", "")
      .csv(path)

  def writeCsv(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    ordered(df).write.mode(mode)
      .option("header", "true")
      .option("escape", "\"")
      .option("nullValue", CsvNull)
      .option("emptyValue", "\"\"")
      .csv(path)

  /** ORC: the columnar alternative where the lake standardizes on Hive
    * tooling — splittable, predicate-pushdown-capable like Parquet (the
    * schema is still passed explicitly: a schema mismatch should fail
    * fast at analysis, not surface as nulls mid-job). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(docSchema).orc(path)

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    ordered(df).write.mode(mode).orc(path)
}
