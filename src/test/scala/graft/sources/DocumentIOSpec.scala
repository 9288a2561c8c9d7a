package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JSONL/CSV corpus round-trips: content with quotes, commas, newlines,
  * unicode and JSON-looking text must survive both formats byte-for-byte. */
class DocumentIOSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "r1", "a/b.scala", "c0", "scala", "object A { val s = \"x,y\" }"),
    (2L, "r1", "a/c.json", "c0", "json", "{\"k\": [1, 2, {\"n\": \"v\"}]}"),
    (3L, "r2", "d.txt", "c1", "text", "line one\nline two, with commas\n\"quoted\""),
    (4L, "r2", "e.py", "c1", "python", "print('unicode: é世界')"),
    (5L, "r2", "f.md", "c1", null, null), // null lang + content survive
    (6L, "r3", "g.txt", "c2", "text", "") // empty string stays "", not null
  ).toDF("id", "repo", "path", "commit", "lang", "content")

  private def slurp(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("id").collect().map(_.toSeq).toSeq

  test("JSONL round-trip is lossless") {
    val dir = java.nio.file.Files.createTempDirectory("docs-jsonl").toString
    DocumentIO.writeJsonl(docs, dir)
    val back = DocumentIO.readJsonl(spark, dir)
    assert(back.schema == DocumentIO.docSchema ||
      back.schema.fieldNames.toSeq == DocumentIO.docSchema.fieldNames.toSeq)
    assert(slurp(back) == slurp(docs))
  }

  test("CSV round-trip is lossless (quotes, commas, embedded newlines)") {
    val dir = java.nio.file.Files.createTempDirectory("docs-csv").toString
    DocumentIO.writeCsv(docs, dir)
    val back = DocumentIO.readCsv(spark, dir)
    assert(slurp(back) == slurp(docs))
  }

  test("ORC round-trip is lossless") {
    val dir = java.nio.file.Files.createTempDirectory("docs-orc").toString
    DocumentIO.writeOrc(docs, dir)
    val back = DocumentIO.readOrc(spark, dir)
    assert(back.schema.fieldNames.toSeq == DocumentIO.docSchema.fieldNames.toSeq)
    assert(slurp(back) == slurp(docs))
  }

  test("JSONL source feeds the ER pipeline unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("docs-jsonl-er").toString
    DocumentIO.writeJsonl(docs.where(col("content").isNotNull), dir)
    val corpus = graft.pipeline.Corpus.withDerived(DocumentIO.readJsonl(spark, dir))
    assert(corpus.select("sha256").distinct().count() == 5) // incl. sha256("")
  }
}
