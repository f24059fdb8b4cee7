package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** O-27 JDBC load (categorizer.py:82-87's intended-but-unused config,
  * save_to_sql's insert-if-absent loop at categorizer.py:150-188) —
  * executed for real against embedded Derby (`jdbc:derby:memory:`,
  * jars ship with Spark): write → read-back of all three tables, FK
  * integrity, re-run idempotence, and incremental id continuation.
  * A final test keeps the unreachable-server path pinned (plan
  * construction reaches the connection layer, fails there, not in
  * analysis).
  */
class JdbcSinkSpec extends SparkSpec {

  private def props: java.util.Properties = new java.util.Properties()

  private def writeHtml(dir: java.nio.file.Path, name: String, cats: Seq[String]): Unit = {
    val lis = cats.map(c => s"<li><a>$c</a></li>").mkString
    java.nio.file.Files.write(dir.resolve(name),
      s"""<div id="mw-normal-catlinks"><ul>$lis</ul></div>"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  private def fkViolations(m: Categorize.Model): (Long, Long) = (
    m.pageCategories.join(m.pages.select(col("id").as("page_id")),
      Seq("page_id"), "left_anti").count(),
    m.pageCategories.join(m.categories.select(col("id").as("category_id")),
      Seq("category_id"), "left_anti").count())

  test("Derby round-trip: sync writes all three tables; re-run writes nothing; new page continues ids") {
    val url = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"
    val dir = java.nio.file.Files.createTempDirectory("graft-derby-")
    writeHtml(dir, "Alpha.html", Seq("C1", "C2"))
    writeHtml(dir, "Beta.html", Seq("C2", "C3"))

    // fresh database: everything is a delta
    Categorize.syncToJdbc(spark, Categorize.processHtmlFiles(spark, dir.toString), url, props)
    val r1 = Categorize.loadFromJdbc(spark, url, props).get
    assert(r1.pages.count() == 2 && r1.categories.count() == 3 &&
      r1.pageCategories.count() == 4)
    assert(fkViolations(r1) == (0L, 0L))
    // ids are the dense deterministic surrogate keys
    assert(r1.categories.orderBy(col("id")).select(col("name"))
      .collect().map(_.getString(0)).toSeq == Seq("C1", "C2", "C3"))

    // re-run on identical input: insert-if-absent appends zero rows
    Categorize.syncToJdbc(spark, Categorize.processHtmlFiles(spark, dir.toString), url, props)
    val r2 = Categorize.loadFromJdbc(spark, url, props).get
    assert(r2.pages.count() == 2 && r2.categories.count() == 3 &&
      r2.pageCategories.count() == 4, "re-run must be idempotent")

    // incremental run: one new page, one new + one existing category
    writeHtml(dir, "Gamma.html", Seq("C3", "C4"))
    Categorize.syncToJdbc(spark, Categorize.processHtmlFiles(spark, dir.toString), url, props)
    val r3 = Categorize.loadFromJdbc(spark, url, props).get
    assert(r3.pages.count() == 3 && r3.categories.count() == 4 &&
      r3.pageCategories.count() == 6)
    assert(fkViolations(r3) == (0L, 0L))
    val c4 = r3.categories.filter(col("name") === "C4")
      .select(col("id")).first().getLong(0)
    assert(c4 == 4L, s"new category id must continue from DB max, got $c4")
  }

  test("loadFromJdbc: fresh db is None, partial store throws, connection errors propagate") {
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // fresh database: all three tables missing -> None (create-on-demand)
    val fresh = s"jdbc:derby:memory:graftfresh${System.nanoTime()};create=true"
    assert(Categorize.loadFromJdbc(spark, fresh, props).isEmpty)
    // partially initialized store (a crash between the three writes):
    // must FAIL FAST, not be mistaken for fresh — syncing against it
    // would re-mint ids and append duplicates
    val partial = s"jdbc:derby:memory:graftpart${System.nanoTime()};create=true"
    val conn = java.sql.DriverManager.getConnection(partial)
    conn.createStatement().execute(
      "CREATE TABLE pages (id BIGINT, file_name VARCHAR(255))")
    conn.close()
    val e = intercept[IllegalStateException] {
      Categorize.loadFromJdbc(spark, partial, props)
    }
    assert(e.getMessage.contains("partially initialized"))
    // a NON-missing-table failure (no such database, no create flag)
    // must propagate, never read as "fresh"
    intercept[Exception] {
      Categorize.loadFromJdbc(spark,
        s"jdbc:derby:memory:graftnodb${System.nanoTime()}", props)
    }
  }

  test("unreachable server still fails at the connection layer, not in analysis") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc-")
    writeHtml(dir, "p.html", Seq("C1"))
    val m = Categorize.run(spark, dir.toString)
    val e = intercept[Exception] {
      Categorize.saveToJdbc(m,
        "jdbc:mysql://localhost:3306/wiki", new java.util.Properties())
    }
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"),
      s"expected a JDBC-layer failure, got: ${e.getClass.getName}: $msg")
  }
}
