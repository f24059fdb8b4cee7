package graft
import org.apache.spark.sql.SparkSession

/** Plan-dump diagnostic: `sbt "runMain graft.ExplainQ <sfDir> <query>"`
  * executes the registered query (so AQE finalizes) and prints the
  * executed plan — the companion to Prof (wall/stage profile) and
  * ShuffleAudit (bytes). */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    // Drive THIS dataframe's own QueryExecution to completion without
    // materializing on the driver: a noop write (and even
    // Dataset.foreach, via its separate rddQueryExecution) finalizes a
    // DIFFERENT QueryExecution and the printed plan stays
    // isFinalPlan=false; collect() OOMs the diagnostic JVM on
    // corpus-sized outputs. queryExecution.toRdd is the same QE's
    // internal-row RDD — foreach on it executes and discards rows on
    // the executors.
    df.queryExecution.toRdd.foreach(_ => ())
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
