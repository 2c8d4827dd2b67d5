package graft

import graft.sources.Jsonl
import org.apache.spark.sql.functions._

/** JSONL round-trip exactness for the documents corpus: hostile content
  * (embedded newlines, tabs, quotes, backslashes, non-ASCII, nulls)
  * survives write→read bit-exactly under an explicit schema.
  */
class JsonlSpec extends SparkSpec {

  test("documents round-trip JSONL exactly, including hostile content and nulls") {
    val base = java.nio.file.Files.createTempDirectory("jsonl").toString
    val src = graft.sources.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      // hostile injections: every 7th doc gets newline/tab/quote/backslash
      // + combining-accent content; every 11th doc a NULL lang
      .withColumn("text", when(col("doc_id") % 7 === 2,
        concat(col("text"), lit(" line1\nline2\ttab \"quoted\" back\\slash café")))
        .otherwise(col("text")))
      .withColumn("lang", when(col("doc_id") % 11 === 3, lit(null: String))
        .otherwise(col("lang")))

    Jsonl.write(src, s"$base/docs")
    val back = Jsonl.read(spark, s"$base/docs", src.schema)

    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(src.exceptAll(back).count() == 0 && back.exceptAll(src).count() == 0)
    // the hostile rows specifically survived
    val hostile = back.filter(col("doc_id") % 7 === 2)
      .filter(col("text").contains("line1\nline2") &&
        col("text").contains("\"quoted\"") &&
        col("text").contains("back\\slash") &&
        col("text").contains("café"))
    assert(hostile.count() == src.filter(col("doc_id") % 7 === 2).count())
    // explicit nulls survived as nulls
    assert(back.filter(col("doc_id") % 11 === 3 && col("lang").isNull).count() ==
      src.filter(col("doc_id") % 11 === 3).count())
  }
}
