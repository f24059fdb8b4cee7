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

  test("schema evolution on a multi-month corpus: mergeSchema unions columns, old files read null") {
    // a 100 TB corpus is written over months; late files add columns.
    // The read side must union schemas and null-fill the old files —
    // and the evolved column must still be usable in filters/aggs.
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "alpha"), (2L, "beta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", "en", 0.9), (4L, "delta", "fr", 0.2))
      .toDF("doc_id", "text", "lang", "quality").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("batch", "doc_id", "lang", "quality", "text"))
    val rows = merged.orderBy("doc_id")
      .select("doc_id", "lang", "quality")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.toSeq === Seq(
      (1L, None, None), (2L, None, None),
      (3L, Some("en"), Some(0.9)), (4L, Some("fr"), Some(0.2))))
    // the evolved column filters/aggregates across the whole corpus:
    // old-file rows are simply absent from the predicate's matches
    assert(merged.filter(col("quality") > 0.5).count() === 1L)
    assert(merged.agg(sum(col("quality"))).head.getDouble(0) === 1.1)
  }

  test("schema evolution: an explicit read schema projects missing columns as null without mergeSchema") {
    // the cheaper production pattern: pin the CURRENT schema on read
    // (no footer-merge job over millions of files) — parquet fills
    // absent columns with null per file
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pin").toString + "/data"
    Seq((1L, "alpha")).toDF("doc_id", "text").write.parquet(dir)
    val pinned = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val out = spark.read.schema(pinned).parquet(dir).collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq ===
      Seq((1L, "alpha", None)))
  }

  test("schema evolution: incompatible column types fail the merge loudly, never coerce silently") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_clash").toString
    Seq((1L, 42)).toDF("doc_id", "v").write.parquet(s"$dir/batch=1")
    Seq((2L, "not a number")).toDF("doc_id", "v").write.parquet(s"$dir/batch=2")
    val e = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null &&
      (m.contains("merge") || m.contains("incompatible") || m.contains("Failed"))),
      s"expected a loud merge failure, got: ${e.getMessage}")
  }
}
