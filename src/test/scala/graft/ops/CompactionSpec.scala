package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The layout contracts of [[Compaction]]: inverse file-count scaling
  * with the target, sizes within 2× of target both ways, exact content
  * round-trip, and AQE-responsiveness of the REBALANCE path.
  */
class CompactionSpec extends SparkSpec {

  private def mkCorpus(path: String): Unit = {
    import spark.implicits._
    // ~200 KB on disk: 2,000 rows of incompressible-ish hex payload
    // (md5 chains), written as 8 files so compact() has something to do.
    (0 until 2000).toDF("id")
      .select(col("id"),
        md5(col("id").cast("string")).as("a"),
        md5(concat(lit("x"), col("id").cast("string"))).as("b"))
      .repartition(8)
      .write.mode("overwrite").parquet(path)
  }

  private def dataFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))

  test("compact sizes files to the target from exact source bytes") {
    val tmp = java.nio.file.Files.createTempDirectory("compaction").toString
    mkCorpus(s"$tmp/in")
    val total = Compaction.dataBytes(spark, s"$tmp/in")
    assert(total > 50_000, s"fixture too small to test sizing: $total bytes")

    val target = (total + 5) / 6 // ceil(total/6): divides back to exactly 6
    val nSmall = Compaction.compact(spark, s"$tmp/in", s"$tmp/out_small", target)
    val nLarge = Compaction.compact(spark, s"$tmp/in", s"$tmp/out_large", total * 2)
    assert(nSmall == 6, s"ceil(total / ceil(total/6)) must be 6, got $nSmall")
    assert(nLarge == 1)

    val smallFiles = dataFiles(s"$tmp/out_small")
    assert(smallFiles.size == nSmall)
    assert(dataFiles(s"$tmp/out_large").size == 1)
    // round-robin balance: every file within 2x of target on both sides
    // (re-encoding drift only; the byte math itself is exact)
    smallFiles.foreach { f =>
      assert(f.length > target / 2 && f.length < target * 2,
        s"${f.getName}: ${f.length} B not within 2x of target $target B")
    }
    // content round-trips exactly
    val in = spark.read.parquet(s"$tmp/in").collect().map(_.toString).sorted
    val out = spark.read.parquet(s"$tmp/out_small").collect().map(_.toString).sorted
    assert(in.sameElements(out))
  }

  test("targetFileCount ceils — files never exceed target by design") {
    assert(Compaction.targetFileCount(100, 100) == 1)
    assert(Compaction.targetFileCount(101, 100) == 2)
    assert(Compaction.targetFileCount(0, 100) == 1)
    assert(Compaction.targetFileCount(1000, 1) == 1000)
    intercept[IllegalArgumentException](Compaction.targetFileCount(1, 0))
  }

  test("compact rejects a partitionBy layout instead of silently writing one file") {
    val tmp = java.nio.file.Files.createTempDirectory("compaction_part").toString
    import spark.implicits._
    (0 until 100).map(i => (i, i % 3)).toDF("id", "p")
      .write.partitionBy("p").mode("overwrite").parquet(s"$tmp/in")
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, s"$tmp/in", s"$tmp/out", 1 << 20)
    }
    assert(e.getMessage.contains("leaf partition"),
      s"wrong failure: ${e.getMessage}")
    // leaf partition dirs themselves compact fine
    assert(Compaction.compact(spark, s"$tmp/in/p=0", s"$tmp/out0", 1 << 20) == 1)
    assert(spark.read.parquet(s"$tmp/out0").count() == 34)
  }

  test("writeRebalanced responds to the AQE advisory partition size") {
    val tmp = java.nio.file.Files.createTempDirectory("rebalance").toString
    import spark.implicits._
    val df = (0 until 4000).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("a"))
    val conf = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    withConf(conf -> "32k") { Compaction.writeRebalanced(df, s"$tmp/fine") }
    withConf(conf -> "64m") { Compaction.writeRebalanced(df, s"$tmp/coarse") }
    val fine = dataFiles(s"$tmp/fine").size
    val coarse = dataFiles(s"$tmp/coarse").size
    assert(coarse == 1, s"64m advisory over ~200KB of exchange bytes must coalesce to 1, got $coarse")
    assert(fine > coarse, s"32k advisory must split more than 64m: fine=$fine coarse=$coarse")
    // content identical through the rebalance
    assert(spark.read.parquet(s"$tmp/fine").count() == 4000)
  }
}
