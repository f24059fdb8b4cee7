package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("saltedJoin equals the plain join exactly, including a pathological hot key") {
    val s = spark
    import s.implicits._
    // 10k facts, 90% on one hot key — the shape that serializes a plain
    // shuffle join onto one task
    val fact = (1 to 10000)
      .map(i => (i.toLong, if (i % 10 == 0) i % 7 else 0, s"p$i"))
      .toDF("row_id", "k", "payload")
    val dim = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "dim_val")

    val plain = fact.join(dim, Seq("k"))
      .select("row_id", "k", "payload", "dim_val")
    val salted = SkewJoin.saltedJoin(fact, dim, "k", col("row_id"), saltFactor = 8)
      .select("row_id", "k", "payload", "dim_val")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads the hot key across saltFactor join partitions") {
    val s = spark
    import s.implicits._
    val fact = (1 to 4000).map(i => (i.toLong, 42, i)).toDF("row_id", "k", "v")
    val salts = fact
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .groupBy("__salt").count().collect()
    assert(salts.length === 8) // all 8 subkeys populated
    // deterministic hash salt: no subtask gets more than ~2x the mean
    assert(salts.map(_.getLong(1)).max <= 2 * 4000 / 8)
  }
}
