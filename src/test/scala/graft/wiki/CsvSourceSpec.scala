package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV as an interchange source/sink format (the reference's ecosystem
  * speaks parquet + MySQL; CSV is the remaining bulk format a user would
  * exchange): schema-explicit read — NEVER inferSchema at scale, which
  * costs a full extra pass over the data — plus PERMISSIVE
  * corrupt-record quarantine, the same dirty-data contract q65 pins for
  * JSON.
  */
class CsvSourceSpec extends SparkSpec {

  test("csv round-trip preserves values under an explicit schema") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = Seq((1L, "alpha", 3.5), (2L, "be,ta", -1.25), (3L, "", 0.0))
      .toDF("id", "name", "score")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/t")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = s.read.schema(schema).option("header", "true").csv(s"$dir/t")
    // quoting survives the embedded comma; empty string reads as null
    // (Spark csv's default emptyValue round-trip — the documented caveat)
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows(1).getString(1) === "be,ta")
    assert(rows(2).isNullAt(1))
    assert(rows.map(_.getDouble(2)).toSeq === Seq(3.5, -1.25, 0.0))
  }

  test("PERMISSIVE csv read quarantines malformed rows in _corrupt_record") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/rows.csv"),
      "1,ok,2.0\nnot_a_long,broken,xyz\n3,fine,4.5\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("_corrupt_record", StringType)))
    val df = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(s"$dir/rows.csv")
      .cache() // corrupt-record column requires materializing the raw row
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(df.filter(col("_corrupt_record").isNull).count() === 2)
    // the bad row keeps its raw text for quarantine/replay
    val bad = df.filter(col("_corrupt_record").isNotNull).collect()(0)
    assert(bad.getString(bad.fieldIndex("_corrupt_record"))
      === "not_a_long,broken,xyz")
    df.unpersist()
  }
}
