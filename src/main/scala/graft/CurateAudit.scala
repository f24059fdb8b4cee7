package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Scale audit for the COMPOSED curation pipeline (`curation.Curate`):
  * one run = the whole quality → dedup → near-dup → decontaminate →
  * rebalance → chunk → pack → write journey, with input/shuffle bytes
  * from the task-metrics listener and the funnel report inline.
  *
  * This is the complement of ShuffleAudit's per-query rows: bench
  * isolation deliberately re-pays shared subtrees per query (q72/q89/
  * q111/q112 each re-derive the q32 pair graph), while the composed
  * pipeline computes each shared frame once — the number a training-
  * data team actually pays. Comparing two scale factors shows whether
  * the COMPOSITION (not just each operator) moves data linearly.
  *
  * Usage: `sbt "runMain graft.CurateAudit /root/testdata/sf0.1 /tmp/shards"`
  * Prints one JSON line.
  */
object CurateAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curate").toString)
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.add(m.shuffleWriteMetrics.bytesWritten)
          inputBytes.add(m.inputMetrics.bytesRead)
        }
      }
    })

    val nJobs = new java.util.concurrent.atomic.AtomicInteger()
    val nStages = new java.util.concurrent.atomic.AtomicInteger()
    val nTasks = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = nJobs.incrementAndGet()
      override def onStageSubmitted(st: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = nStages.incrementAndGet()
      override def onTaskStart(t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = nTasks.incrementAndGet()
    })
    val t0 = System.nanoTime()
    val r = curation.Curate.run(spark, sfDir, outDir, verbose = true)
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
    println(s"[curate-jobs] jobs=${nJobs.get} stages=${nStages.get} tasks=${nTasks.get}")
    println(
      s"""{"sf":"$sfDir","in":${inputBytes.sum()},"sh":${shuffleBytes.sum()},""" +
        s""""wall":${math.rint(wall * 100) / 100},"funnel":{"input":${r.nInput},""" +
        s""""quality":${r.nQuality},"lm":${r.nLmPass},"exact":${r.nExactDedup},""" +
        s""""near":${r.nNearDedup},"media":${r.nMediaDedup},"decontam":${r.nDecontaminated},""" +
        s""""sem":${r.nSemClean},"rewritten":${r.nRewritten},"thinned":${r.nThinned},""" +
        s""""sampled":${r.nSampled},""" +
        s""""chunks":${r.nChunks},"shards":${r.nShards},"tokens":${r.nTokens}}}""")
    spark.stop()
  }
}
