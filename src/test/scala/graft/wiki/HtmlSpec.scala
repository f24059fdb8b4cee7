package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture tests for the HTML extraction ops against the exact structures
  * the reference probes (FIXTURES.md §A; reference semantics cited per
  * test). Golden values are hand-computed.
  */
class HtmlSpec extends SparkSpec {

  val fullPage: String =
    """<html><head><title>Spark (software)</title>
      |<style>body { color: red }</style>
      |<script>var tracked = true;</script>
      |</head><body>
      |<!-- comment should vanish -->
      |<p>Apache Spark is a <b>unified</b> analytics engine &amp; more.</p>
      |<noscript>enable js</noscript>
      |<div id="mw-normal-catlinks"><ul>
      |  <li><a href="/wiki/Category:Big_data">Big data</a></li>
      |  <li><a href="/wiki/Category:JVM">JVM <b>software</b></a></li>
      |</ul></div>
      |<li id="footer-info-lastmod"> This page was last edited on 12 March 2025, at 10:11 (UTC).</li>
      |<a href="/wiki/Hadoop">H</a>
      |<a href="https://en.wikipedia.org/wiki/Flink">F</a>
      |<a href="https://example.com/x">ext</a>
      |<a href="/wiki/Hadoop">dup</a>
      |</body></html>""".stripMargin

  // --- extract_categories (categorizer.py:89-101) ---

  test("categories: first ul under catlinks div, anchor text, nested tags flattened") {
    assert(Html.extractCategories(fullPage) === Seq("Big data", "JVM software"))
  }

  test("categories: page without the catlinks div -> empty (categorizer.py:95-96)") {
    assert(Html.extractCategories("<html><body><p>x</p></body></html>") === Seq.empty)
  }

  test("categories: catlinks div without a ul -> empty (categorizer.py:99)") {
    assert(Html.extractCategories(
      """<div id="mw-normal-catlinks"><span>no list</span></div>""") === Seq.empty)
  }

  test("categories: null html -> empty") {
    assert(Html.extractCategories(null) === Seq.empty)
  }

  // --- extract_last_edited_date (categorizer.py:103-122) ---

  test("lastmod text: strips boilerplate prefix, ' (UTC)', and truncates at comma") {
    assert(Html.extractLastmodText(fullPage) === "12 March 2025")
  }

  test("lastmod text: missing li -> null (categorizer.py:118-121)") {
    assert(Html.extractLastmodText("<html><body></body></html>") === null)
  }

  test("lastEditedDate column: parses 'd MMMM yyyy', null on garbage") {
    val out = evalStr(
      Seq(fullPage,
        """<li id="footer-info-lastmod">This page was last edited on 32 Foobruary 2025, at 9 (UTC).</li>""",
        "<p>no li</p>"),
      Html.lastEditedDate(col("s")))
    assert(out === Seq(java.sql.Date.valueOf("2025-03-12"), null, null))
  }

  // --- extract_text (converter.py:35-44) ---

  test("text: drops script/style/head/title/noscript/comments, keeps body text, single-spaced") {
    val txt = Html.extractText(fullPage)
    assert(!txt.contains("color: red"))
    assert(!txt.contains("tracked"))
    assert(!txt.contains("Spark (software)")) // title inside head
    assert(!txt.contains("enable js"))
    assert(!txt.contains("comment should vanish"))
    assert(txt.startsWith("Apache Spark is a unified analytics engine & more."))
    assert(txt.contains("Big data"))   // catlinks text IS body text
    assert(txt.contains("12 March 2025"))
    assert(!txt.contains("  "))        // single-space joined
  }

  test("text: null html -> empty string") {
    assert(Html.extractText(null) === "")
  }

  test("text: mid-word comment is a node boundary, not whitespace (BeautifulSoup parity)") {
    // a comment splits no words: removing it with '' rejoins the halves
    assert(Html.extractText("<p>foo<!--c-->bar</p>") === "foobar")
  }

  test("text: '</script>' inside a comment inside a script does not leak remnants") {
    val h = "<p>a</p><script>x();<!-- </script> --> y();</script><p>b</p>"
    // comment pass removes '<!-- </script> -->' first, so the script
    // subtree match runs to the REAL close tag — no 'y();' leakage
    assert(Html.extractText(h) === "a b")
  }

  // --- extract links (fetcher main.py:116-123) ---

  test("links: href extraction, urljoin-style absolutization, set-dedup") {
    val links = Html.extractLinks(fullPage, "https://en.wikipedia.org/wiki/Spark")
    assert(links === Seq(
      "https://en.wikipedia.org/wiki/Category:Big_data",
      "https://en.wikipedia.org/wiki/Category:JVM",
      "https://en.wikipedia.org/wiki/Hadoop",
      "https://en.wikipedia.org/wiki/Flink",
      "https://example.com/x"))
  }

  test("links: no anchors -> empty; null html -> empty") {
    assert(Html.extractLinks("<p>plain</p>", "https://x.org") === Seq.empty)
    assert(Html.extractLinks(null, "https://x.org") === Seq.empty)
  }

  // --- sanitize_filename (utils.py:4-11) ---

  test("sanitize: basename, charset replace, and remove-EVERY-'.html' quirk") {
    val out = evalStr(
      Seq("/data/pages/Apache Spark!.html",
        "/data/a.html.b.html",          // mid-name .html removed too
        "relative path.html",           // no '/': the WHOLE string is the basename (re.search "[^/]+$")
        "/dir/ends/with/"),
      Html.sanitizeFilename(col("s")))
    assert(out === Seq("Apache_Spark_", "a.b", "relative_path", ""))
  }

  // --- word count (categorizer.py:137) ---

  test("wordCount: whitespace-naive size(split(value,' ')) over RAW html") {
    val out = evalStr(Seq("a b  c", "one", ""), Html.wordCount(col("s")))
    // split on single space: "a b  c" -> ["a","b","","c"] = 4
    assert(out === Seq(4, 1, 1))
  }
}
