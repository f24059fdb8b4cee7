package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Binary-column plumbing: native header decode, frame sampling,
  * batched mapPartitions featurization, and the binaryFile ingest path.
  * The decoder is the deterministic fake (no codecs in this container);
  * everything around it is the real Spark surface.
  */
class MultimodalSpec extends SparkSpec {

  private def mediaDs = {
    val s = spark
    import s.implicits._
    Seq(
      Media(1L, "image", encodeFake(1, 640, 480, 3, bodyLen = 100, seed = 7)),
      Media(2L, "audio", encodeFake(2, 0, 0, 2, bodyLen = 64, seed = 11)),
      Media(3L, "video", encodeFake(3, 1920, 1080, 3, bodyLen = 500, seed = 3)))
      .toDS()
  }

  test("native header decode (substring/hex/conv on BinaryType) matches the encoder") {
    val decoded = mediaDs.toDF()
      .filter(isGrft(col("payload")))
      .select(col("media_id"), metaColumns(col("payload")).as("m"))
      .select("media_id", "m.kind_code", "m.width", "m.height", "m.channels", "m.body_bytes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))
      .toSet
    assert(decoded === Set(
      (1L, 1, 640, 480, 3, 100L),
      (2L, 2, 0, 0, 2, 64L),
      (3L, 3, 1920, 1080, 3, 500L)))
  }

  test("metadata filter prunes without touching payload bodies (native, no UDF)") {
    val wide = mediaDs.toDF()
      .filter(isGrft(col("payload")) && metaColumns(col("payload"))("width") >= 1000)
    assert(wide.select("media_id").collect().map(_.getLong(0)).toSeq === Seq(3L))
    // plan stays UDF-free: no BatchEvalPython/ScalaUDF nodes
    val plan = wide.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"))
  }

  test("frameSample returns n full-length strided slices of the body") {
    val s = spark
    import s.implicits._
    val frames = mediaDs.filter(_.media_id == 3L).toDF()
      .select(frameSample(col("payload"), n = 4, frameLen = 16).as("frames"))
      .select(size(col("frames")).as("n"),
        expr("transform(frames, f -> length(f))").as("lens"))
      .collect().head
    assert(frames.getInt(0) === 4)
    assert(frames.getSeq[Int](1) === Seq(16, 16, 16, 16))
  }

  test("extractFeatures runs the batched per-partition decoder (fake codec)") {
    val s = spark
    import s.implicits._
    val feats = extractFeatures(mediaDs.repartition(2))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(1L).width === 640 && feats(1L).height === 480)
    assert(feats(1L).n_bytes === 109L)
    // body bytes of media 1: (7+i) % 251 for i in 0..99 -> mean = 7 + 99/2
    assert(math.abs(feats(1L).mean_byte - (7 + 99 / 2.0)) < 1e-9)
    assert(feats(2L).channels === 2)
  }

  test("binaryFile ingest round-trips payload bytes and partitions by file") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_media").toString
    val p1 = encodeFake(1, 32, 32, 1, bodyLen = 10, seed = 1)
    val p3 = encodeFake(3, 64, 64, 3, bodyLen = 20, seed = 2)
    Files.write(Paths.get(dir, "a.img"), p1)
    Files.write(Paths.get(dir, "b.vid"), p3)
    Files.writeString(Paths.get(dir, "ignore.txt"), "not media")

    val ds = readBinaryDir(s, dir, "*.{img,vid}")
    val byKind = ds.collect().map(m => m.kind -> m.payload).toMap
    assert(byKind.keySet === Set("img", "vid"))
    assert(byKind("img").toSeq === p1.toSeq)
    assert(byKind("vid").toSeq === p3.toSeq)

    // and the native decode composes with the ingest
    val widths = ds.toDF().select(metaColumns(col("payload"))("width").as("w"))
      .collect().map(_.getInt(0)).toSet
    assert(widths === Set(32, 64))
  }

  test("resizeAll rewrites geometry, sizes the body exactly, and resamples predictably") {
    val out = resizeAll(mediaDs, 16, 8).collect().map(m => m.media_id -> m).toMap
    val src = mediaDs.collect().map(m => m.media_id -> m).toMap
    out.foreach { case (id, m) =>
      val p = m.payload
      val channels = p(7) & 0xff
      val w = ((p(3) & 0xff) << 8) | (p(4) & 0xff)
      val h = ((p(5) & 0xff) << 8) | (p(6) & 0xff)
      assert((w, h) === (16, 8), s"media $id header not rewritten")
      assert(p.length === HeaderLen + 16 * 8 * math.max(channels, 1),
        s"media $id body not exactly targetW*targetH*channels")
      // nearest-neighbor arithmetic is fully predictable
      val sp = src(id).payload
      val srcBody = sp.length - HeaderLen
      val dstBody = p.length - HeaderLen
      (0 until dstBody).foreach { i =>
        val j = math.min((i.toLong * srcBody / dstBody).toInt, srcBody - 1)
        assert(p(HeaderLen + i) === sp(HeaderLen + j), s"media $id byte $i")
      }
    }
    // and the native metadata decode agrees with the rewritten headers
    val meta = resizeAll(mediaDs, 16, 8).toDF()
      .select(metaColumns(col("payload")).as("m"))
      .selectExpr("m.width", "m.height").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(meta === Set((16, 8)))
  }
}
