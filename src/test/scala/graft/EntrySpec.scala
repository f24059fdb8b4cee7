package graft

import org.apache.spark.sql.functions._

/** The driver contract itself: entry returns rows, every oracle key
  * names a registered query, and aliases stay consistent (the
  * column-name discipline the hash-compare depends on).
  */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows at the smoke SF") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key is a registered query and names are unique") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
    assert(qs.keySet.toSeq.length === qs.size)
  }

  test("only the documented engine-private sketches lack an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set("q99_hll_distinct"),
      s"undocumented rows-only queries: $noOracle")
  }
}
