package graft.wiki

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML extraction ops matching the reference ETL's BeautifulSoup UDFs on
  * well-formed (fixture) HTML, plus the filename sanitizer.
  *
  * sanitizeFilename is pure built-ins (Catalyst sees through it); the two
  * tree-shaped extractions (category list, text with subtree removal) are
  * Scala UDFs — the same boundary the survey drew (SURVEY.md §7): UDFs
  * only where the semantics are genuinely tree-structured, native
  * expressions everywhere else. Scala UDFs run in the executor JVM (no
  * Python-worker serialization wall like the reference's
  * BatchEvalPython nodes).
  */
object Html {

  /** Filename sanitizer per ETL/tasks/utils.py:4-11: basename via
    * `[^/]+$` ('' when the path ends with '/'), characters outside
    * [a-zA-Z0-9._-] replaced with '_', then EVERY '.html' occurrence
    * removed (the reference uses str.replace, not a suffix strip —
    * 'a.html.b.html' -> 'a.b'). Pure built-ins, no UDF.
    */
  def sanitizeFilename(filePath: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_extract(filePath, "[^/]+$", 0),
        "[^a-zA-Z0-9._-]", "_"),
      "\\.html", "")

  /** Decode the handful of HTML entities that matter for fixture parity
    * with BeautifulSoup's full entity decoding.
    */
  private def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  /** Text of one element with nested tags stripped, per BeautifulSoup
    * `get_text(strip=True)` on an inline element.
    */
  private def innerText(html: String): String =
    decodeEntities(html.replaceAll("<[^>]*>", " "))
      .split("\\s+").filter(_.nonEmpty).mkString(" ").trim

  /** Category list per categorizer.py:89-101: the first <ul> inside
    * <div id="mw-normal-catlinks">, text of each <a>; empty when the div
    * or the ul is absent.
    */
  val extractCategories: String => Seq[String] = { html =>
    if (html == null) Seq.empty
    else {
      val divRe =
        """(?is)<div[^>]*\bid\s*=\s*["']mw-normal-catlinks["'][^>]*>(.*?)</div>""".r
      divRe.findFirstMatchIn(html) match {
        case None => Seq.empty
        case Some(m) =>
          val ulRe = """(?is)<ul[^>]*>(.*?)</ul>""".r
          ulRe.findFirstMatchIn(m.group(1)) match {
            case None => Seq.empty
            case Some(ul) =>
              val aRe = """(?is)<a\b[^>]*>(.*?)</a>""".r
              aRe.findAllMatchIn(ul.group(1)).map(a => innerText(a.group(1))).toSeq
          }
      }
    }
  }

  /** The lastmod date STRING per categorizer.py:103-116: text of
    * <li id="footer-info-lastmod">, ' (UTC)' removed, the boilerplate
    * prefix removed, truncated at the first comma. Returns null when the
    * li is absent; the date parse itself stays a column op (see
    * [[lastEditedDate]]) so only the tree probe is a UDF.
    */
  val extractLastmodText: String => String = { html =>
    if (html == null) null
    else {
      val liRe =
        """(?is)<li[^>]*\bid\s*=\s*["']footer-info-lastmod["'][^>]*>(.*?)</li>""".r
      liRe.findFirstMatchIn(html) match {
        case None => null
        case Some(m) =>
          innerText(m.group(1))
            .replace(" (UTC)", "")
            .replace("This page was last edited on ", "")
            .split(",", -1)(0)
      }
    }
  }

  /** Plain text per converter.py:35-44: remove script/style/meta/head/
    * title/noscript subtrees, then all text nodes stripped and joined
    * with single spaces.
    */
  val extractText: String => String = { html =>
    if (html == null) ""
    else {
      val noComments = html.replaceAll("(?s)<!--.*?-->", "")
      val noSubtrees = Seq("script", "style", "head", "title", "noscript")
        .foldLeft(noComments) { (h, tag) =>
          h.replaceAll(s"(?is)<$tag\\b[^>]*>.*?</$tag>", " ")
        }
        .replaceAll("(?is)<meta\\b[^>]*/?>", " ")
      decodeEntities(noSubtrees.replaceAll("<[^>]*>", " "))
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
  }

  /** All href targets of <a> tags, in document order (fetcher
    * main.py:116-123 extracts them with BeautifulSoup and absolutizes via
    * urljoin; absolutization here uses java.net.URI.resolve, which agrees
    * with urljoin on the well-formed fixture links).
    */
  val extractLinks: (String, String) => Seq[String] = { (html, baseUrl) =>
    if (html == null) Seq.empty
    else {
      val hrefRe = """(?is)<a\b[^>]*\bhref\s*=\s*["']([^"']*)["']""".r
      val base = try new java.net.URI(baseUrl) catch { case _: Exception => null }
      hrefRe.findAllMatchIn(html).map(_.group(1)).flatMap { href =>
        if (base == null) Some(href)
        else try Some(base.resolve(href).toString) catch { case _: Exception => None }
      }.toSeq
    }
  }

  // Registered UDF columns (executor-JVM evaluation, ArrayType/StringType
  // schemas declared at registration like categorizer.py:126-128).
  import org.apache.spark.sql.functions.udf
  val extractCategoriesUdf = udf(extractCategories)
  val extractLastmodTextUdf = udf(extractLastmodText)
  val extractTextUdf = udf(extractText)
  val extractLinksUdf = udf(extractLinks)

  /** Full last-edited-date op (categorizer.py:103-122): tree probe (UDF)
    * + English-month date parse ('d MMMM yyyy', Locale.US pattern engine),
    * null on absence or parse failure (the reference's except path).
    */
  def lastEditedDate(value: Column): Column =
    try_to_timestamp(extractLastmodTextUdf(value), lit("d MMMM yyyy")).cast("date")

  /** Word count per categorizer.py:137: size(split(value, ' ')) over the
    * RAW page source — whitespace-naive by design, replicated exactly.
    */
  def wordCount(value: Column): Column = size(split(value, " "))
}
