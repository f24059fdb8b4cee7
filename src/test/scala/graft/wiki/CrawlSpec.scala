package graft.wiki

import graft.SparkSpec

/** Crawler-as-BFS over a cyclic 3-page fixture graph (SURVEY.md §3.3):
  * the seen-set anti-join terminates the A→B→C→A cycle, the domain
  * filter drops external links, normalization collapses query/slash
  * variants, and an un-fetchable frontier URL is still recorded seen —
  * mirroring fetcher/parser/filter + Redis semantics.
  */
class CrawlSpec extends SparkSpec {

  private val wiki = "https://en.wikipedia.org/wiki"

  test("crawl: cyclic graph terminates; depths, dedup, domain filter, dead links") {
    import spark.implicits._
    val pageA =
      s"""<a href="$wiki/B">b</a> <a href="$wiki/C?ref=a">c</a>
         |<a href="https://example.com/out">ext</a> <a href="$wiki/B">dup</a>""".stripMargin
    val pageB = s"""<a href="$wiki/C/">c</a> <a href="$wiki/A">back</a>"""
    val pageC = s"""<a href="$wiki/A">cycle</a> <a href="$wiki/Dead">missing</a>"""
    val web = Seq(
      (s"$wiki/A", pageA), (s"$wiki/B", pageB), (s"$wiki/C", pageC)
    ).toDF("url", "html")

    val seen = Crawl.crawl(spark, web, s"$wiki/A")
      .orderBy("depth", "url").collect().toSeq
      .map(r => (r.getString(0), r.getInt(1)))

    assert(seen === Seq(
      (s"$wiki/A", 0),
      (s"$wiki/B", 1),
      (s"$wiki/C", 1),        // '?ref=a' and trailing '/' variants collapse
      (s"$wiki/Dead", 2)))    // enqueued as seen though never fetchable
  }

  test("crawl: maxDepth bounds the frontier expansion") {
    import spark.implicits._
    val chain = (0 until 5).map { i =>
      (s"$wiki/P$i", s"""<a href="$wiki/P${i + 1}">next</a>""")
    }.toDF("url", "html")
    val seen = Crawl.crawl(spark, chain, s"$wiki/P0", maxDepth = 2)
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1))).sorted
    assert(seen === Seq((s"$wiki/P0", 0), (s"$wiki/P1", 1), (s"$wiki/P2", 2)))
  }
}
