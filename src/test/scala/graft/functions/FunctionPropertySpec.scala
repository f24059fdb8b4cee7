package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic properties of the custom expressions, generated with
  * ScalaCheck and evaluated through the real Spark path — one DataFrame
  * per property (a job per sample would be pathologically slow), fixed
  * seed for reproducibility, same style as wiki.PropertySpec.
  */
class FunctionPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(0xF00DL + i)))

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-1e3, 1e3).map(d => math.rint(d * 100) / 100))

  test("property: dot_f is commutative (IEEE multiply commutes exactly)") {
    val s = spark
    import s.implicits._
    val pairs = samples(Gen.zip(vecGen, vecGen))
    val rows = pairs.toDF("a", "b")
      .select(GraftFunctions.dot(col("a"), col("b")).as("ab"),
        GraftFunctions.dot(col("b"), col("a")).as("ba"))
      .collect()
    rows.foreach(r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("property: simhash_bits is permutation-invariant (majority counts ignore order)") {
    val s = spark
    import s.implicits._
    val gen = for {
      vals <- Gen.listOfN(9, Gen.chooseNum(0L, (1L << 20) - 1))
      seed <- Gen.chooseNum(0, 1000)
    } yield (vals, new scala.util.Random(seed).shuffle(vals))
    val rows = samples(gen).toDF("a", "b")
      .select(GraftFunctions.simhash(col("a"), 20).as("fa"),
        GraftFunctions.simhash(col("b"), 20).as("fb"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("property: ngrams is byte-identical to the interpreted HOF chain, all n and lengths") {
    val s = spark
    import s.implicits._
    val tokGen: Gen[List[String]] =
      Gen.chooseNum(0, 9).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "bb", "ccc", "spark", "x1", "_")))
    for (n <- 2 to 5) {
      // (sequence(1, 0) DESCENDS in Spark, so short arrays need the guard)
      val hof = s"case when size(ts) >= $n then " +
        s"transform(sequence(1, size(ts) - ${n - 1}), " +
        s"i -> concat_ws(' ', ${(0 until n).map(j => s"element_at(ts, i + $j)").mkString(", ")})) " +
        s"else array() end"
      val rows = samples(tokGen).toDF("ts")
        .select(GraftFunctions.ngrams(col("ts"), n).as("native"), expr(hof).as("hofv"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"n=$n mismatch")
      }
    }
  }

  private val strListGen: Gen[List[String]] =
    Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(20)),
      Gen.const(""),
      Gen.asciiPrintableStr.map(_.take(15))))

  test("property: md5_longs ≡ the conv(substring(md5)) HOF chain, for nHex in {4,7,15}") {
    val s = spark
    import s.implicits._
    Seq(4, 7, 15).foreach { n =>
      val rows = samples(strListGen).toDF("arr")
        .select(GraftFunctions.md5Longs(col("arr"), n).as("native"),
          expr(s"transform(arr, t -> cast(conv(substring(md5(t), 1, $n), 16, 10) as bigint))")
            .as("hof"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"nHex=$n"))
    }
  }

  test("property: rolling_hash ≡ the aggregate((acc*131+x)%1e9+7) HOF fold") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(20, Gen.chooseNum(0L, (1L << 28) - 1))
    val rows = samples(gen).toDF("arr")
      .select(GraftFunctions.rollingHash(col("arr")).as("native"),
        expr("aggregate(arr, 0L, (acc, x) -> (acc*131 + x) % 1000000007)").as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("minhash64 on pre-hashed longs == minhash64 on strings (the shingledHashed contract)") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(12, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val rows = samples(gen, 50).map(Tuple1(_)).toDF("a")
      .select(GraftFunctions.minhash64(col("a"), 32).as("ms"),
        GraftFunctions.minhash64(expr("transform(a, t -> xxhash64(t))"), 32)
          .as("mh"))
      .collect()
    rows.foreach(r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1),
        "hashed-input minhash diverged from the string path"))
  }

  test("minhash64: deterministic, k minima, and a shared shingle lowers or keeps each minimum") {
    val s = spark
    import s.implicits._
    val base = List("a b c", "b c d", "c d e")
    val rows = Seq((base, "x y z" :: base))
      .toDF("a", "b")
      .select(GraftFunctions.minhash64(col("a"), 32).as("ma"),
        GraftFunctions.minhash64(col("b"), 32).as("mb"))
      .collect()
    val (ma, mb) = (rows(0).getSeq[Long](0), rows(0).getSeq[Long](1))
    assert(ma.size === 32 && mb.size === 32)
    // superset's minima are <= subset's, per permutation (minhash monotonicity)
    ma.zip(mb).foreach { case (a, b) => assert(b <= a) }
    // and re-evaluation is bit-stable
    val again = Seq(Tuple1(base)).toDF("a")
      .select(GraftFunctions.minhash64(col("a"), 32)).collect()(0).getSeq[Long](0)
    assert(again === ma)
  }

  test("parse_page struct equals the four separate ops (UDF parity) on fixture-shaped html") {
    val s = spark
    import s.implicits._
    val pages = Seq(
      "<html><head><title>t</title></head><body>" +
        "<div id=\"mw-normal-catlinks\"><ul><li><a>Cat A</a></li><li><a>B&amp;C</a></li></ul></div>" +
        "<li id=\"footer-info-lastmod\">This page was last edited on 3 March 2024, at 10:11 (UTC).</li>" +
        "<p>hello  world</p></body></html>",
      "<p>no structure at all</p>",
      "")
    val df = pages.toDF("html")
      .select(col("html"), GraftFunctions.parsePage(col("html")).as("p"))
      .select(
        col("p.categories"),
        graft.wiki.Html.extractCategoriesUdf(col("html")).as("cats_udf"),
        col("p.lastmodText"),
        graft.wiki.Html.extractLastmodTextUdf(col("html")).as("lm_udf"),
        col("p.text"),
        graft.wiki.Html.extractTextUdf(col("html")).as("text_udf"),
        col("p.word_count"),
        graft.wiki.Html.wordCount(col("html")).as("wc_builtin"))
      .collect()
    df.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getString(2) === r.getString(3))
      assert(r.getString(4) === r.getString(5))
      assert(r.getInt(6) === r.getInt(7))
    }
  }
}
