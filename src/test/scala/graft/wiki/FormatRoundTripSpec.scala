package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Storage-format matrix: the engine's frames survive a write→read
  * round-trip in every bundled columnar/text format (parquet is gated
  * by the driver harness every round; this spec covers ORC, JSON, and
  * CSV — with each format's documented type-fidelity caveats, which is
  * the actual knowledge a 100 TB pipeline needs when picking formats).
  */
class FormatRoundTripSpec extends SparkSpec {

  private def sample = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "alpha beta", 3.25, java.sql.Timestamp.valueOf("2024-03-01 10:00:00")),
      (2L, "with,comma and \"quotes\"", -0.5, java.sql.Timestamp.valueOf("2024-03-01 11:30:00")),
      (3L, null.asInstanceOf[String], 0.0, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "txt", "score", "ts")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString + "/out"

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("id")).collect().toSeq.map(_.toSeq)

  test("ORC round-trips schema and values exactly (columnar twin of parquet)") {
    val p = tmp("orc")
    sample.write.orc(p)
    val back = spark.read.orc(p)
    // names + types survive; nullability WIDENS to true on read (file
    // formats don't persist Spark's non-null flag — same as parquet)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      === sample.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(sortedRows(back) === sortedRows(sample))
  }

  test("JSON lines round-trip values under an explicit schema; nulls drop to absent keys") {
    val p = tmp("json")
    sample.write.json(p)
    // schema-on-read would widen/reorder; production contract is an
    // EXPLICIT schema (TIMESTAMP needs it — JSON has no timestamp type)
    val back = spark.read.schema(sample.schema).json(p)
    assert(sortedRows(back) === sortedRows(sample))
  }

  test("CSV round-trips under explicit schema with quoting; null-vs-empty needs the flag") {
    val p = tmp("csv")
    sample.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss").csv(p)
    val back = spark.read.schema(sample.schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      // CSV cannot distinguish null from "" without an explicit marker;
      // Spark's default writes null as empty and reads empty as null,
      // which round-trips our nulls but would CORRUPT genuine empty
      // strings — the caveat this test documents.
      .csv(p)
    assert(sortedRows(back) === sortedRows(sample))
  }

  test("the documents table itself survives an ORC round-trip byte-for-byte") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val p = tmp("docsorc")
    docs.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.schema === docs.schema)
    assert(back.orderBy(col("doc_id")).collect().toSeq
      === docs.orderBy(col("doc_id")).collect().toSeq)
  }
}
