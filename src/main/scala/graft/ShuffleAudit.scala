package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Shuffle-volume audit: run every registered query at a given SF and
  * report, per query, the bytes that actually crossed a shuffle
  * boundary (write side) and the bytes read from the source scans.
  *
  * Timing noise-free scale evidence: wall-clock varies with host
  * contention, but shuffle volume is a deterministic property of the
  * plan + data. Comparing two scale factors shows directly which
  * operators move data LINEARLY in the corpus (explode-heavy text
  * ops), SUBLINEARLY (pre-aggregated / hash-reduced shuffles —
  * fingerprints instead of text), or CONSTANT (broadcast-only plans
  * whose only shuffle is a sources-sized agg) — i.e. which plans
  * survive a 100x scale-up and which become the network bottleneck.
  *
  * Usage: `sbt "runMain graft.ShuffleAudit /root/testdata/sf0.01"`
  * Prints one JSON line: {"sf":..., "queries":{name:{"in":bytes,
  * "sh":bytes}}}.
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new LongAdder
    val inputBytes = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.add(m.inputMetrics.bytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_REPEAT=N runs the (filtered) list N times in ONE
    // session — the warm-vs-cold session experiment (BENCH_NOTES round
    // 8's residual-exchange investigation): occurrence k>1 of a query
    // reports with a "#k" key suffix.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "1").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    val runList = (1 to repeat).flatMap(k => names.map(n => (n, k)))
    val rows = runList.map { case (name, k) =>
      shuffleBytes.reset(); inputBytes.reset()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      // listener events are posted asynchronously; drain before reading
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      (if (k == 1) name else s"$name#$k", inputBytes.sum(), shuffleBytes.sum())
    }
    val qs = rows.map { case (n, in, sh) =>
      val short = n.takeWhile(_ != '_') + (if (n.contains('#')) n.dropWhile(_ != '#') else "")
      s""""$short":{"in":$in,"sh":$sh}"""
    }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","queries":$qs}""")
    spark.stop()
  }
}
