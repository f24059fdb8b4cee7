package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the URL column ops vs the reference's parser/fetcher
  * semantics (parser main.py:15-40, fetcher main.py:46-77).
  */
class UrlsSpec extends SparkSpec {

  test("normalize: lowercases scheme+host, strips trailing slashes, drops query/fragment") {
    val out = evalStr(
      Seq("HTTPS://EN.Wikipedia.org/wiki/Spark/",
        "https://en.wikipedia.org/wiki/Spark?action=edit#top",
        "https://en.wikipedia.org/wiki/Spark///",
        "https://en.wikipedia.org"),
      Urls.normalize(col("s")))
    assert(out === Seq(
      "https://en.wikipedia.org/wiki/Spark",
      "https://en.wikipedia.org/wiki/Spark",
      "https://en.wikipedia.org/wiki/Spark",
      "https://en.wikipedia.org"))
  }

  test("normalize is idempotent on already-normal URLs") {
    val urls = Seq(
      "https://en.wikipedia.org/wiki/Spark",
      "http://en.wikipedia.org/a/b_c",
      "https://en.wikipedia.org")
    val once = evalStr(urls, Urls.normalize(col("s")))
    val twice = evalStr(once.map(_.asInstanceOf[String]), Urls.normalize(col("s")))
    assert(once === twice)
  }

  test("isWikipedia: suffix match on host, CASE-SENSITIVE like the reference's netloc.endswith") {
    val out = evalStr(
      Seq("https://en.wikipedia.org/wiki/X",
        "https://simple.en.wikipedia.org/wiki/X",
        "https://EN.Wikipedia.org/wiki/X",   // mixed case host REJECTED (parser main.py:24)
        "https://example.com/en.wikipedia.org", // path, not host
        "not a url at all"),
      Urls.isWikipedia(col("s")))
    assert(out === Seq(true, true, false, false, false))
  }

  test("filenameFromUrl: scheme strip, replace-all, '.html' suffix (fetcher main.py:46-47)") {
    val out = evalStr(
      Seq("https://en.wikipedia.org/wiki/Spark?v=1&k=2",
        "http://a.org/b:c"),
      Urls.filenameFromUrl(col("s")))
    assert(out === Seq(
      "en.wikipedia.org_wiki_Spark_v_1_k_2.html",
      "a.org_b_c.html"))
  }

  test("parseRfc1123: parses HTTP dates on Spark 4 (weekday pattern workaround), null on garbage") {
    val out = evalStr(
      Seq("Tue, 12 Mar 2024 10:11:12 GMT",
        "Wed, 01 Jan 2025 00:00:00 GMT",
        "garbage",
        "Tue, 99 Mar 2024 10:11:12 GMT"),
      Urls.parseRfc1123(col("s")))
    assert(out === Seq(
      java.sql.Timestamp.valueOf("2024-03-12 10:11:12"),
      java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
      null, null))
  }

  test("formatRfc1123 round-trips through parseRfc1123") {
    import spark.implicits._
    val ts = Seq("2024-03-12 10:11:12", "1997-06-30 23:59:59")
    val back = ts.toDF("s")
      .select(Urls.parseRfc1123(Urls.formatRfc1123(col("s").cast("timestamp"))).as("r"))
      .collect().toSeq.map(_.get(0))
    assert(back === ts.map(java.sql.Timestamp.valueOf))
  }
}
