package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins TopKAggregator's buffer algebra against a brute-force
  * reference — added in round 21 when the O(1) fast-reject landed in
  * `reduce` (the unconditional sort-take was O(k log k) + a fresh Seq
  * per input row). The reject path must be output-invisible: any
  * element ordering at/after the current k-th can neither enter nor
  * displace, so the final sorted top-k is identical.
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def ref(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.key)).take(k)

  test("reduce stream == brute-force top-k, every insertion order, ties included") {
    val k = 3
    val agg = new TopKAggregator(k)
    // duplicate scores force the key tie-break through the reject path
    val xs = Seq(
      Scored(7L, 0.5), Scored(1L, 0.9), Scored(9L, 0.5), Scored(2L, 0.9),
      Scored(5L, 0.1), Scored(3L, 0.9), Scored(8L, 0.5), Scored(4L, 1.2))
    xs.permutations.take(200).foreach { p =>
      val got = p.foldLeft(agg.zero)(agg.reduce)
      assert(got === ref(xs, k), s"order $p")
    }
  }

  test("merge of partial buffers == brute-force over the union") {
    val k = 5
    val agg = new TopKAggregator(k)
    val rnd = new scala.util.Random(21)
    val xs = Seq.fill(200)(Scored(rnd.nextLong(1000), rnd.nextInt(40) / 7.0))
      .distinctBy(_.key)
    val (a, b) = xs.splitAt(xs.size / 3)
    val bufA = a.foldLeft(agg.zero)(agg.reduce)
    val bufB = b.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(bufA, bufB)) === ref(xs, k))
  }

  test("fewer than k inputs keep everything, sorted") {
    val agg = new TopKAggregator(10)
    val xs = Seq(Scored(3L, 0.2), Scored(1L, 0.8), Scored(2L, 0.2))
    assert(xs.foldLeft(agg.zero)(agg.reduce) === ref(xs, 10))
  }
}
