package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Star-contraction CC contracts: equality with the Pregel min-label
  * form on the real pair graph, equality with driver-side union-find
  * on generated graphs, the deep-chain case (the diameter shape that
  * motivates the O(log n) algorithm), and the empty graph.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.largeStarSmallStar(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val vs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    vs.map(v => v -> vs.filter(u => find(u) == find(v)).min).toMap
  }

  test("star contraction == min-label propagation on the real q32 pair graph") {
    val pairs = graft.queries.LlmOps.q32NearDupPairs
      .fn(spark, "/root/testdata/sf0.001")
      .select(col("id_a"), col("id_b")).localCheckpoint()
    val star = ConnectedComponents.largeStarSmallStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val pregel = graft.queries.TrainingOps.minLabelClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(star === pregel)
  }

  test("property: star contraction == union-find on generated graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
    (0 until 8).foreach { i =>
      val pairs = edgeGen(Gen.Parameters.default, Seed(0xCAFEL + i)).get
        .filter { case (a, b) => a != b }
      assert(labelsOf(pairs) === unionFind(pairs), s"case $i: $pairs")
    }
  }

  test("deep chain (the O(diameter) killer) resolves to a single min-labeled component") {
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toSeq
    val m = labelsOf(chain)
    assert(m.size === 200 && m.values.forall(_ == 0L))
  }

  test("empty and self-loop-only inputs yield an empty labeling") {
    assert(labelsOf(Nil).isEmpty)
    assert(labelsOf(Seq((5L, 5L))).isEmpty)
  }
}
