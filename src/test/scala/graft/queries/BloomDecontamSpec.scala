package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q133's Bloom machinery, pinned independently of the oracle:
  * positions against a JVM-side md5 mirror, the structural bitmap
  * invariants, and the property the oracle can't express as a single
  * assertion — NO FALSE NEGATIVES (every exactly-shared gram q77
  * counts must be bloom-flagged, per Bloom's one-sided error).
  */
class BloomDecontamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val mBits = 131072L

  /** Driver-side mirror of bloomPosSql: position i = the i-th 32-bit
    * big-endian slice of md5(gram) mod m. */
  private def jvmPositions(gram: String): Seq[Long] = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    (0 until 4).map(i =>
      java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16) % mBits)
  }

  test("bloomWords sets exactly the JVM-mirrored bit positions") {
    import spark.implicits._
    val grams = Seq("the quick brown fox jumps", "pack my box with five")
    // parquet round-trip so md5/conv run against a real scan, not a
    // constant-folded LocalTableScan
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    grams.toDF("g").write.mode("overwrite").parquet(dir)
    val got = TrainingOps.bloomWords(spark.read.parquet(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = grams.flatMap(jvmPositions).distinct
      .groupBy(_ / 32)
      .map { case (w, ps) =>
        w -> ps.map(p => 1L << (p % 32).toInt).reduce(_ | _)
      }
    assert(got === expected)
    // 32-bit words: no mask may touch bit 32+ (the sign-free contract
    // both engines' shift/AND arithmetic relies on)
    assert(got.values.forall(w => (w & 0xffffffff00000000L) == 0L))
    assert(got.keys.forall(w => w >= 0 && w < mBits / 32))
  }

  test("no false negatives: every q77 exactly-shared doc is flagged with >= count") {
    val exact = TrainingOps.q77Decontaminate.fn(spark, sf)
      .select(col("doc_id"), col("n_shared")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = TrainingOps.q133BloomDecontam.fn(spark, sf)
      .select(col("doc_id"), col("n_flagged")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty, "fixture regression: no exact contamination at sf0.001")
    exact.foreach { case (doc, nShared) =>
      assert(bloom.contains(doc), s"doc $doc exactly contaminated but not bloom-flagged")
      assert(bloom(doc) >= nShared,
        s"doc $doc: bloom flagged ${bloom(doc)} < exact $nShared — impossible for a Bloom filter")
    }
  }
}
