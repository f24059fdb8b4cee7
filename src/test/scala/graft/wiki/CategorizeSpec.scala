package graft.wiki

import graft.SparkSpec
import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets

/** End-to-end categorizer pipeline test (categorizer.py:124-191 →
  * Categorize): wholetext scan + input_file_name over fixture HTML
  * written by the test, single-pass extraction, explode → distinct →
  * anti-join → row_number surrogate keys → pages/categories/bridge.
  * Golden values hand-computed; idempotence (the UNIQUE-constraint
  * invariant, categorizer.py:52,65) and incremental-load key continuity
  * asserted explicitly.
  */
class CategorizeSpec extends SparkSpec {

  private def page(cats: Seq[String], lastmod: Option[String], body: String): String = {
    val catHtml =
      if (cats.isEmpty) ""
      else cats.map(c => s"""<li><a href="/wiki/Category:$c">$c</a></li>""")
        .mkString("""<div id="mw-normal-catlinks"><ul>""", "", "</ul></div>")
    val lm = lastmod.fold("")(d =>
      s"""<li id="footer-info-lastmod">This page was last edited on $d, at 10:11 (UTC).</li>""")
    s"<html><body><p>$body</p>$catHtml$lm</body></html>"
  }

  // NOTE "spark core.html": input_file_name() yields the percent-encoded
  // file URI ("spark%20core.html") — exactly what the reference's UDF
  // sees from PySpark too — so the sanitized name is "spark_20core".
  private val fixtures: Map[String, String] = Map(
    "spark core.html" -> page(Seq("Big data", "JVM"), Some("12 March 2025"), "spark body"),
    "hadoop.html" -> page(Seq("Big data"), None, "hadoop body text"),
    "misc.html" -> page(Seq.empty, Some("32 Foobruary 999"), "no cats here"))

  private def writeFixtures(): Path = {
    val dir = Files.createTempDirectory("graft-cat-")
    fixtures.foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  test("processHtmlFiles: wholetext + input_file_name + extraction frame (categorizer.py:124-141)") {
    val dir = writeFixtures()
    val rows = Categorize.processHtmlFiles(spark, dir.toString)
      .orderBy("file_name").collect().toSeq
    assert(rows.map(_.getString(0)) === Seq("hadoop", "misc", "spark_20core"))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    assert(byName("spark_20core").getSeq[String](1) === Seq("Big data", "JVM"))
    assert(byName("hadoop").getSeq[String](1) === Seq("Big data"))
    assert(byName("misc").getSeq[String](1) === Seq.empty)
    // word_count = whitespace-naive split of the RAW html (categorizer.py:137)
    fixtures.foreach { case (name, content) =>
      val key = name.replace(".html", "").replace(" ", "_20")
      assert(byName(key).getInt(2) === content.split(" ", -1).length,
        s"word_count mismatch for $key")
    }
    assert(byName("spark_20core").getDate(3) === java.sql.Date.valueOf("2025-03-12"))
    assert(byName("hadoop").get(3) === null)   // li absent
    assert(byName("misc").get(3) === null)     // unparseable date -> null
  }

  test("readPagesBinary ≡ readPages: the binaryFile ingest twin yields the identical frame") {
    val dir = writeFixtures()
    def snapshot(df: org.apache.spark.sql.DataFrame) =
      df.select("value", "file_path").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._2).toSeq
    val whole = snapshot(Categorize.readPages(spark, dir.toString))
    val binary = snapshot(Categorize.readPagesBinary(spark, dir.toString))
    assert(binary === whole,
      "binaryFile twin diverged from the wholetext frame")
    // and the glob filter really scopes the scan: a non-html file is ignored
    Files.write(dir.resolve("notes.txt"), "not html".getBytes(StandardCharsets.UTF_8))
    assert(Categorize.readPagesBinary(spark, dir.toString).count() === fixtures.size)
  }

  test("normalize: deterministic surrogate keys, natural-key dedup, M2M bridge (categorizer.py:150-188)") {
    val dir = writeFixtures()
    val m = Categorize.run(spark, dir.toString)
    val pages = m.pages.orderBy("id").collect().toSeq
    assert(pages.map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "hadoop"), (2L, "misc"), (3L, "spark_20core")))
    val cats = m.categories.orderBy("id").collect().toSeq
    assert(cats.map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "Big data"), (2L, "JVM")))
    val bridge = m.pageCategories.orderBy("page_id", "category_id").collect().toSeq
    assert(bridge.map(r => (r.getLong(0), r.getLong(1))) ===
      Seq((1L, 1L), (3L, 1L), (3L, 2L)))
  }

  test("categoryDistribution: the README.md:23 analysis over the bridge") {
    val dir = writeFixtures()
    val dist = Categorize.categoryDistribution(Categorize.run(spark, dir.toString))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(dist === Seq(("Big data", 2L), ("JVM", 1L)))
  }

  test("normalize is idempotent: reloading the same pages inserts nothing (UNIQUE invariant)") {
    val dir = writeFixtures()
    val processed = Categorize.processHtmlFiles(spark, dir.toString)
    val first = Categorize.normalize(processed)
    val second = Categorize.normalize(processed, Some(first))
    assert(second.pages.count() === first.pages.count())
    assert(second.categories.count() === first.categories.count())
    assert(second.pages.orderBy("id").collect().toSeq ===
      first.pages.orderBy("id").collect().toSeq)
  }

  test("incremental load: new page continues ids from existing max (AUTO_INCREMENT semantics)") {
    val dir = writeFixtures()
    val first = Categorize.run(spark, dir.toString)
    val dir2 = Files.createTempDirectory("graft-cat2-")
    Files.write(dir2.resolve("zeppelin.html"),
      page(Seq("JVM", "Notebooks"), Some("1 January 2026"), "z")
        .getBytes(StandardCharsets.UTF_8))
    val processed2 = Categorize.processHtmlFiles(spark, dir2.toString)
    val m2 = Categorize.normalize(processed2, Some(first))
    val pages = m2.pages.orderBy("id").collect().toSeq
    assert(pages.map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "hadoop"), (2L, "misc"), (3L, "spark_20core"), (4L, "zeppelin")))
    val cats = m2.categories.orderBy("id").collect().toSeq
    // "JVM" already exists as id 2; only "Notebooks" is minted, at id 3
    assert(cats.map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "Big data"), (2L, "JVM"), (3L, "Notebooks")))
  }
}
