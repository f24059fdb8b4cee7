package graft.wiki

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL scalar ops re-expressing the crawler's parser/fetcher semantics as
  * native column expressions (codegen-friendly — no UDFs, so Catalyst can
  * push/fold around them).
  *
  * Reference semantics (cited file:line under /root/reference/):
  *  - parser main.py:15-40 `parse_wikipedia_link`: keep scheme (Python
  *    urlparse lowercases it), lowercase netloc, rstrip '/' from path,
  *    drop params/query/fragment; return null for non-Wikipedia hosts.
  *    The host check `netloc.endswith("en.wikipedia.org")` is
  *    CASE-SENSITIVE in the reference — a mixed-case host is rejected
  *    even though it would survive normalization; replicated faithfully.
  *  - fetcher main.py:46-47: filename from URL — strip http:// and
  *    https:// (all occurrences), '/' -> '_', then [:?&=] -> '_'
  *    (the regex also re-replaces '/'), append '.html'.
  *  - fetcher main.py:63-77: RFC-1123 `Last-Modified` parse, null on
  *    failure (strptime '%a, %d %b %Y %H:%M:%S %Z').
  */
object Urls {

  val WikiDomain = "en.wikipedia.org"

  /** The reference's (case-sensitive) Wikipedia-host predicate.
    * try_parse_url, NOT parse_url: Spark 4's parse_url THROWS
    * [INVALID_URL] on malformed input (found by UrlsSpec), while the
    * reference's urlparse never does — a crawler meets malformed hrefs
    * constantly, so a throwing predicate would kill the whole job.
    * Malformed → host null → false.
    */
  def isWikipedia(url: Column): Column =
    coalesce(try_parse_url(url, lit("HOST")).endsWith(WikiDomain), lit(false))

  /** Normalized URL per parser main.py:26-34: lowercased scheme + host,
    * path with trailing slashes stripped, query/fragment dropped.
    * Malformed URLs normalize to null (concat propagates try_parse_url's
    * null), matching the reference's None return for unparseable links.
    */
  def normalize(url: Column): Column =
    concat(
      lower(try_parse_url(url, lit("PROTOCOL"))), lit("://"),
      lower(try_parse_url(url, lit("HOST"))),
      regexp_replace(coalesce(try_parse_url(url, lit("PATH")), lit("")), "/+$", ""))

  /** Local-storage filename per fetcher main.py:46-47 (including the
    * str.replace-all semantics and the '.html' suffix append).
    */
  def filenameFromUrl(url: Column): Column =
    concat(
      regexp_replace(
        regexp_replace(
          regexp_replace(url, "http://|https://", ""),
          "/", "_"),
        "[:/?&=]", "_"),
      lit(".html"))

  /** RFC-1123 timestamp parse (fetcher main.py:74), null on failure like
    * the reference's except-path — try_to_timestamp, not to_timestamp,
    * because Spark 4 ANSI mode turns parse failures into runtime errors.
    *
    * Day-of-week patterns ('E') are format-only since Spark 3.0 — using
    * them for PARSING throws SparkUpgradeException
    * [DATETIME_PATTERN_RECOGNITION] even under try_to_timestamp (the
    * exception is raised at pattern compile, not per-row). So: strip the
    * weekday prefix and the 'GMT' zone suffix, then parse the remaining
    * 'dd MMM yyyy HH:mm:ss'. HTTP-date is always GMT (RFC 9110 §5.6.7),
    * and the session timezone is pinned to UTC by every entry point, so
    * dropping the literal zone is lossless — same semantics as the
    * reference's strptime '%Z', which also ignores the zone's offset.
    * A string whose weekday or timestamp is malformed still yields null
    * (regexp leaves it unstripped → parse fails → try_ returns null).
    *
    * Shape gate: try_to_timestamp's failure path CONSTRUCTS AND CATCHES
    * a DateTimeParseException per row (plus a legacy-formatter retry) —
    * on a malformed-heavy column that exception machinery dominated q39
    * at sf0.1. The rlike pre-filter accepts exactly the shapes the
    * strip-then-parse path could possibly accept (optional 'Weekday, '
    * prefix, 2-digit day, 3-letter month, 4-digit year, HH:mm:ss,
    * optional GMT suffix), so known-garbage rows short-circuit to null
    * without ever touching the parser; a gated-in row with a bogus
    * month name ('99 Foo ...') still falls through to try_'s null.
    */
  def parseRfc1123(s: Column): Column =
    when(
      s.rlike("^([A-Za-z]+, )?\\d{2} [A-Za-z]{3} \\d{4} \\d{2}:\\d{2}:\\d{2}(\\s+GMT)?$"),
      try_to_timestamp(
        regexp_replace(s, "^[A-Za-z]+, |\\s+GMT$", ""),
        lit("dd MMM yyyy HH:mm:ss")))

  /** RFC-1123 rendering of a timestamp (for round-trip tests/queries). */
  def formatRfc1123(ts: Column): Column =
    concat(date_format(ts, "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT"))
}
