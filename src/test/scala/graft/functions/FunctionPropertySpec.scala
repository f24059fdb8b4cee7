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
}
