package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corrupt-FILE tolerance (the storage-level sibling of q65's
  * corrupt-RECORD quarantine): at 100 TB some parquet file is always
  * truncated or bit-rotted, and the default fail-the-job behavior turns
  * one bad block into a dead 1000-executor run. `ignoreCorruptFiles`
  * trades those rows for forward progress — this spec pins BOTH
  * behaviors so the trade is a documented choice, not a surprise.
  */
class CorruptFileSpec extends SparkSpec {

  private def layout(): (String, Long) = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corrupt").toString + "/t"
    (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(4).write.parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    // destroy one file's footer (parquet readers need the trailing magic)
    val victim = files.minBy(_.getName).toPath
    java.nio.file.Files.write(victim, Array.fill[Byte](64)(0x5a))
    (dir, files.length.toLong)
  }

  test("default: one corrupt file fails the whole scan") {
    val (dir, _) = layout()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
    val e = intercept[org.apache.spark.SparkException] {
      s2.read.parquet(dir).count()
    }
    assert(Option(e.getMessage).exists(m =>
      m.contains("parquet") || m.contains("Parquet") || m.contains("corrupt")
        || m.contains("footer") || m.contains("magic")), e.getMessage)
  }

  test("ignoreCorruptFiles: the scan survives, losing only the damaged file's rows") {
    val (dir, _) = layout()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    val got = s2.read.schema("id BIGINT, v STRING").parquet(dir)
    val n = got.count()
    assert(n > 0 && n < 100, s"expected partial rows, got $n")
    // surviving rows are intact (no torn values)
    assert(got.filter(col("v").rlike("^row[0-9]+$")).count() === n)
  }
}
