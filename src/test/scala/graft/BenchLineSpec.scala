package graft

import org.scalatest.funsuite.AnyFunSuite

/** Size contract for the bench artifact (round-9 verdict #2).
  *
  * The driver keeps only the LAST ~2000 characters of Bench's stdout and
  * parses the JSON line out of that tail; a line that outgrows the window
  * loses its HEAD and the parse fails silently — the gate evidence
  * vanishes with no error anywhere. At ~12 bytes per query the registry
  * would have crossed the cliff near ~150 queries. This spec renders the
  * line through the real serializer at the LIVE registry size with
  * worst-plausible field widths, so registry growth trips a test instead
  * of truncating the artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  test("bench JSON line fits the driver tail window at the live registry size") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-plausible widths: every query 2-decimal double digits (no
    // registered query has ever exceeded 13 s warm; 99.99 is the widest
    // a 2-decimal sub-100 value renders), gate fired, huge GC figure
    val results = names.map(_ -> 99.99)
    val line = Bench.renderLine(results, Map.empty, "/root/testdata/sf0.1",
      Array(99.99, 99.99, 99.99), Some(99.99), 99.99, 1, 9999999L, 3)
    assert(line.length <= 1843,
      s"bench line would be ${line.length} B at the live registry size — " +
        "over the 1.8 KB budget for the driver's ~2000-char tail window; " +
        "shorten the serialization before adding more queries")
    assert(!line.contains(" "), "bench line must contain no spaces")
  }

  test("qNN key prefixes are unique — the compaction that makes the line fit") {
    val names = SparkEntry.queries.keys.toSeq
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size === names.size,
      s"duplicate short keys: ${prefixes.diff(prefixes.distinct).distinct}")
  }

  test("renderLine emits valid JSON shape (balanced, parseable fields)") {
    val line = Bench.renderLine(
      Seq("q01_pricing_summary" -> 1.234, "q99_hll_distinct" -> -1.0),
      Map("q99_hll_distinct" -> "boom \"quoted\"\nline"),
      "/root/testdata/sf0.01", Array(0.5, 0.4, 0.3), None, 0.6, 0, 123L, 2)
    // structural sanity without a JSON library: balanced braces/quotes,
    // the failure value preserved, escapes applied
    assert(line.count(_ == '{') === line.count(_ == '}'))
    assert(line.contains("\"q01\":1.23"))
    assert(line.contains("\"q99\":-1"))
    assert(line.contains("\\\"quoted\\\""))
    assert(line.contains("\\n"))
    assert(!line.contains("load_pregate"), "pregate field only when gate fired")
    val gatedLine = Bench.renderLine(Seq("q01_x" -> 1.0), Map.empty, "sf",
      Array(2.0, 1.0, 0.5), Some(2.5), 1.0, 1, 0L, 2)
    assert(gatedLine.contains("\"load_pregate\":2.5"))
  }
}
