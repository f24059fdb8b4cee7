package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Throwaway per-job wall profiler for bench-cost hunting:
  * `sbt "runMain graft.Prof <sfDir> <query>"` prints one line per Spark
  * job with its wall ms and the callsite, plus the total.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, qname) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench's shuffle-writer path (sort-based, not bypass) and
      // serializer (Kryo) so profiles describe what the bench actually
      // runs — see Bench's builder comments for the A/Bs and rationale
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    val taskCount = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.LongAdder()
    val stageAgg = TrieMap.empty[Int, java.util.concurrent.atomic.LongAdder]
    val stageName = TrieMap.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("callSite.short")).getOrElse("?"))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, cs) =>
          println(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $cs")
        }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        taskCount.incrementAndGet()
        if (t.taskInfo != null) taskMs.add(t.taskInfo.duration)
        if (t.taskInfo != null)
          stageAgg.getOrElseUpdate(t.stageId, new java.util.concurrent.atomic.LongAdder())
            .add(t.taskInfo.duration)
      }
      override def onStageSubmitted(s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        stageName(s.stageInfo.stageId) = s.stageInfo.name.take(90)
    })
    // exact match first; else a prefix match only when UNambiguous —
    // find() over unordered Map keys made "q12" profile an arbitrary
    // one of q120/q122/q124 (round-11 advice)
    val candidates = SparkEntry.queries.keys.toSeq.sorted
    val resolved = candidates.find(_ == qname).getOrElse {
      candidates.filter(_.startsWith(qname)) match {
        case Seq(one) => one
        case Seq() => sys.error(
          s"Prof: no query named '$qname'; known: ${candidates.mkString(", ")}")
        case many => sys.error(
          s"Prof: ambiguous prefix '$qname' matches ${many.mkString(", ")}")
      }
    }
    val fn = SparkEntry.queries(resolved)
    // warmup
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    println("=== timed pass ===")
    taskCount.set(0); taskMs.reset(); stageAgg.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    // the listener bus is async — drain it before reading the counters,
    // or the tail of the very stages being profiled is undercounted
    org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
    println(f"total $wall%.2f s  " +
      f"tasks=${taskCount.get} taskTime=${taskMs.sum() / 1e3}%.1f s")
    stageAgg.toSeq.sortBy(-_._2.sum()).take(15).foreach { case (sid, ms) =>
      println(f"stage $sid%4d ${ms.sum() / 1e3}%7.2f s  ${stageName.getOrElse(sid, "?")}")
    }
    spark.stop()
  }
}
