package graft.wiki

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** O-28/O-29/O-31 sink round-trips on the local filesystem (the Hadoop
  * FileSystem API used by the sinks resolves file:// URIs to the local
  * FS, HDFS in production — same code path).
  */
class SinksSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("writeHtmlFiles writes one file per row, executor-parallel, and round-trips via wholetext") {
    val s = spark
    import s.implicits._
    val dir = tmp("graft_html_sink")
    val pages = Seq(
      ("PageA.html", "<html><body>alpha beta</body></html>"),
      ("PageB.html", "<html><body>gamma</body></html>"),
      ("PageC.html", "<html><body>delta epsilon zeta</body></html>"))
      .toDF("file_name", "value").repartition(3)
    Sinks.writeHtmlFiles(pages, dir)

    assert(Files.list(Paths.get(dir)).count() === 3)
    // round-trip through the O-1 wholetext scan the Categorize pipeline uses
    val back = Categorize.readPages(s, dir)
    assert(back.count() === 3)
    val a = back.filter(Html.sanitizeFilename(
      org.apache.spark.sql.functions.col("file_path")) === "PageA")
      .select("value").as[String].head()
    assert(a === "<html><body>alpha beta</body></html>")

    // overwrite semantics: re-writing is idempotent, not duplicating
    Sinks.writeHtmlFiles(pages, dir)
    assert(Files.list(Paths.get(dir)).count() === 3)
  }

  test("appendLedger appends with the fixed schema; second append accumulates") {
    val s = spark
    import s.implicits._
    val path = tmp("graft_ledger_batch") + "/ledger"
    val b1 = Seq(("u1", "/srv/u1.html", Timestamp.valueOf("2024-03-01 10:00:00")))
      .toDF("url", "html_path", "last_modified")
    val b2 = Seq(("u2", "/srv/u2.html", null.asInstanceOf[Timestamp]))
      .toDF("url", "html_path", "last_modified")
    Sinks.appendLedger(b1, path)
    Sinks.appendLedger(b2, path)
    val back = s.read.parquet(path)
    assert(back.count() === 2)
    assert(back.schema.fieldNames.sorted === Array("html_path", "last_modified", "url"))
    assert(back.filter("last_modified IS NULL").count() === 1)
  }

  test("markProcessed moves listed files once and is idempotent on re-run") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_src")
    val done = tmp("graft_done")
    Seq("a.html", "b.html", "c.html").foreach(n =>
      Files.writeString(Paths.get(src, n), s"<html>$n</html>"))

    val processed = Seq("a.html", "b.html").toDF("name")
    Sinks.markProcessed(processed, src, done)
    assert(Files.list(Paths.get(src)).count() === 1)  // c stays
    assert(Files.list(Paths.get(done)).count() === 2)

    // second run: sources already moved -> skipped, no failure, no change
    Sinks.markProcessed(processed, src, done)
    assert(Files.list(Paths.get(src)).count() === 1)
    assert(Files.list(Paths.get(done)).count() === 2)
  }

  test("moveProcessed unions categorizer+converter names (reference bug fixed)") {
    val s = spark
    import s.implicits._
    val src = tmp("graft_src2")
    val done = tmp("graft_done2")
    Seq("a.html", "b.html", "c.html").foreach(n =>
      Files.writeString(Paths.get(src, n), "x"))
    // a processed by both pipelines; b only by converter (the set the
    // reference's pipeline.py:73 silently drops)
    Sinks.moveProcessed(s,
      Seq("a.html").toDF("name"), Seq("a.html", "b.html").toDF("name"), src, done)
    assert(Files.list(Paths.get(done)).count() === 2)
    assert(Files.list(Paths.get(src)).count() === 1)
  }
}
