package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q134's soft-dedup invariants: the weights are a PARTITION OF UNITY
  * over clusters (each cluster contributes exactly one document's
  * expected gradient), every document appears exactly once, and the
  * cluster assignment is q72's — not a parallel reimplementation.
  */
class SoftDedupWeightsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("weights sum to exactly 1.0 per cluster; every doc covered once") {
    val w = TrainingOps.q134SoftDedupWeights.fn(spark, sf)
    val rows = w.collect()
    val nDocs = graft.Tables.documentsSpread(spark, sf).count()
    assert(rows.length.toLong == nDocs, "one weight row per document")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getLong(1)).foreach { case (cid, members) =>
      val n = members.head.getLong(2)
      assert(members.forall(_.getLong(2) == n), s"cluster $cid: inconsistent n_members")
      assert(members.length.toLong == n, s"cluster $cid: ${members.length} rows but n_members=$n")
      // n * (1.0/n) is exact only for power-of-two n; sum of the
      // emitted doubles must still land within one ulp per member
      val sum = members.map(_.getDouble(3)).sum
      assert(math.abs(sum - 1.0) <= n * math.ulp(1.0), s"cluster $cid: weight sum $sum")
    }
  }

  test("cluster sizes agree with q72's clusters; singletons weight 1.0") {
    val w = TrainingOps.q134SoftDedupWeights.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val q72 = TrainingOps.q72DupClusters.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // cluster_id -> n_docs
    assert(q72.nonEmpty, "fixture regression: no dup clusters at sf0.001")
    w.foreach { case (doc, cid, n, weight) =>
      q72.get(cid) match {
        case Some(q72n) if q72.contains(cid) && n > 1 =>
          assert(n == q72n, s"doc $doc: n_members $n != q72 cluster size $q72n")
        case _ =>
          assert(n == 1L && cid == doc, s"doc $doc: unclustered must be its own singleton")
      }
      assert(weight == 1.0 / n)
    }
    // the clustered population is exactly q72's membership
    assert(w.count(_._3 > 1).toLong == q72.values.sum,
      "clustered doc count != sum of q72 cluster sizes")
  }
}
