package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq("Tue, 12 Mar 2024 10:11:12 GMT", "garbage", "Xxx, 05 Jan 2026 01:02:03 GMT").toDF("s")
      .select(expr("try_to_timestamp(regexp_replace(s, '^[A-Za-z]+, |\\\\s+GMT$', ''), 'dd MMM yyyy HH:mm:ss')").as("parsed")).show(false)
    Seq("12 March 2025", "32 Foo 2025", "5 January 2026").toDF("s")
      .select(expr("try_to_timestamp(s, 'd MMMM yyyy')").cast("date").as("d")).show(false)
    Seq("hello wörld").toDF("t").select(
      octet_length(expr("encode(t, 'UTF-8')")).as("n"),
      md5(expr("encode(t, 'UTF-8')")).as("digest"),
      base64(expr("encode(t, 'UTF-8')")).as("b64")).show(false)
    // formatting side
    Seq("2024-03-12 10:11:12").toDF("s").select(
      concat(date_format(col("s").cast("timestamp"), "EEE, dd MMM yyyy HH:mm:ss"), lit(" GMT")).as("http_date")).show(false)
    spark.stop()
  }
}
