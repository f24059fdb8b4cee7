package graft.multimodal

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads as opaque BINARY columns with typed metadata, per the north
  * star's extension list. The design rule at 100 TB:
  *
  *  - payloads stay OPAQUE binary end-to-end: Spark shuffles/spills raw
  *    bytes without interpreting them, and Tungsten stores them off-heap;
  *  - metadata lives in typed columns decoded ONCE at ingest by NATIVE
  *    expressions (substring/hex/conv over BinaryType — codegen'd, no
  *    UDF), so filters like `width >= 512` prune BEFORE any expensive
  *    decode and push into the parquet scan on re-read;
  *  - the genuinely library-dependent step (pixel/sample decode) is a
  *    per-partition BATCHED operator ([[extractFeatures]]) behind a
  *    [[MediaDecoder]] seam — the Scala analog of a Pandas-UDF
  *    `mapInPandas` stage: one decoder instance per partition
  *    (connection/codec reuse), iterator-in/iterator-out so Spark
  *    pipelines batches without materializing a partition in memory.
  *
  * Ingest path for real corpora: `spark.read.format("binaryFile")`
  * (path/length/modTime/content), with `spark.sql.files.
  * maxPartitionBytes` sizing partitions — the binary-safe version of the
  * wholetext scan (SURVEY.md §7 risk (e)).
  *
  * This container has no image/audio codecs, so the concrete decoder is
  * a DETERMINISTIC FAKE over a toy container format ("GRFT"); the
  * Spark-side plumbing — schema, binary expressions, partitioning,
  * batch shape — is real and is what the specs test.
  */
object Multimodal {

  /** One media row: opaque payload + routing metadata. */
  final case class Media(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded (fake) features — the output schema a real vision/audio
    * featurizer would produce.
    */
  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int, channels: Int,
      n_bytes: Long, mean_byte: Double)

  // ------------------------------------------------------------------
  // The toy "GRFT" container: 9-byte header + body
  //   bytes 0-1  magic 'G','R'
  //   byte  2    kind: 1=image 2=audio 3=video
  //   bytes 3-4  width  (big-endian u16)
  //   bytes 5-6  height (big-endian u16)
  //   byte  7    channels
  //   byte  8    reserved
  // ------------------------------------------------------------------

  val HeaderLen = 9

  /** Deterministic fixture payload (tests/demos): header + a body whose
    * byte i is (seed + i) % 251 — decodable by arithmetic, no codec.
    */
  def encodeFake(kind: Int, width: Int, height: Int, channels: Int,
      bodyLen: Int, seed: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderLen + bodyLen)
    out(0) = 'G'; out(1) = 'R'; out(2) = kind.toByte
    out(3) = ((width >> 8) & 0xff).toByte; out(4) = (width & 0xff).toByte
    out(5) = ((height >> 8) & 0xff).toByte; out(6) = (height & 0xff).toByte
    out(7) = channels.toByte; out(8) = 0
    var i = 0
    while (i < bodyLen) { out(HeaderLen + i) = ((seed + i) % 251).toByte; i += 1 }
    out
  }

  /** Big-endian unsigned int from `len` bytes at 1-based `pos` of a
    * binary column — pure built-ins (substring works on BinaryType, hex
    * → conv), whole-stage-codegen'd. This is the "decode metadata
    * natively" path: no UDF between the scan and a width/height filter.
    */
  def beUInt(payload: Column, pos: Int, len: Int): Column =
    conv(hex(substring(payload, pos, len)), 16, 10).cast("int")

  /** Header validity + typed metadata projection, all native. */
  def isGrft(payload: Column): Column =
    length(payload) >= HeaderLen && hex(substring(payload, 1, 2)) === "4752"

  def metaColumns(payload: Column): Column = struct(
    beUInt(payload, 3, 1).as("kind_code"),
    beUInt(payload, 4, 2).as("width"),
    beUInt(payload, 6, 2).as("height"),
    beUInt(payload, 8, 1).as("channels"),
    (length(payload) - HeaderLen).cast("long").as("body_bytes"))

  /** N evenly-strided fixed-size "frames" from the body — video
    * frame-sampling as a native expression: array of binary slices, no
    * UDF, no data copy beyond the selected frames. Slices run off the
    * end are dropped (substring pads nothing; a short slice is filtered
    * by its length).
    */
  def frameSample(payload: Column, n: Int, frameLen: Int): Column = {
    val body = length(payload) - HeaderLen
    val stride = greatest((body / n).cast("int"), lit(1))
    filter(
      transform(sequence(lit(0), lit(n - 1)),
        i => payload.substr(lit(HeaderLen + 1) + i * stride, lit(frameLen))),
      f => length(f) === frameLen)
  }

  /** mapInPandas-analog batched featurizer: one [[MediaDecoder]] per
    * partition, iterator-in/iterator-out. The fake decoder is
    * deterministic; a real deployment implements [[MediaDecoder]] with
    * an actual codec (javax.imageio / ffmpeg bindings) — that seam is
    * the ONLY place pixels are touched.
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder: MediaDecoder = new FakeDecoder // per-partition init
      rows.map(m => decoder.decode(m))
    }
  }

  /** The decode seam. A production implementation wraps a codec library
    * and may hold per-partition native resources; implementations MUST
    * be cheap to construct (one per partition) and thread-confined.
    */
  trait MediaDecoder extends Serializable {
    def decode(m: Media): MediaFeatures
  }

  /** Deterministic stand-in for the codec-backed decoder (no image/audio
    * libraries exist in this environment): parses the GRFT header
    * arithmetically and "featurizes" the body as its exact mean byte
    * value. Replace with a real codec at the [[MediaDecoder]] seam.
    */
  final class FakeDecoder extends MediaDecoder {
    def decode(m: Media): MediaFeatures = {
      val p = m.payload
      require(p.length >= HeaderLen && p(0) == 'G' && p(1) == 'R',
        s"not a GRFT payload: media_id=${m.media_id}")
      val width = ((p(3) & 0xff) << 8) | (p(4) & 0xff)
      val height = ((p(5) & 0xff) << 8) | (p(6) & 0xff)
      val body = p.length - HeaderLen
      var sum = 0L
      var i = HeaderLen
      while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
      MediaFeatures(m.media_id, m.kind, width, height, p(7) & 0xff,
        p.length.toLong, if (body == 0) 0.0 else sum.toDouble / body)
    }
  }

  /** The resize seam — same contract as [[MediaDecoder]]: constructed
    * once per partition, thread-confined, payload-in/payload-out with
    * the header rewritten to the target geometry.
    */
  trait MediaResizer extends Serializable {
    def resize(m: Media, targetW: Int, targetH: Int): Media
  }

  /** Deterministic stand-in for a codec-backed resizer: keeps the GRFT
    * header shape, rewrites width/height, and "resamples" the body to
    * targetW*targetH*channels bytes by nearest-neighbor striding over
    * the original body — pure index arithmetic, so tests can predict
    * every output byte. A real implementation swaps in an image
    * library at this seam; nothing above it changes.
    */
  final class FakeResizer extends MediaResizer {
    def resize(m: Media, targetW: Int, targetH: Int): Media = {
      val p = m.payload
      require(p.length >= HeaderLen && p(0) == 'G' && p(1) == 'R',
        s"not a GRFT payload: media_id=${m.media_id}")
      val channels = p(7) & 0xff
      val srcBody = p.length - HeaderLen
      val dstBody = targetW * targetH * math.max(channels, 1)
      val out = new Array[Byte](HeaderLen + dstBody)
      System.arraycopy(p, 0, out, 0, HeaderLen)
      out(3) = ((targetW >> 8) & 0xff).toByte; out(4) = (targetW & 0xff).toByte
      out(5) = ((targetH >> 8) & 0xff).toByte; out(6) = (targetH & 0xff).toByte
      var i = 0
      while (i < dstBody) {
        // nearest-neighbor: integer-scaled source index, clamped
        val src = if (dstBody <= 1) 0 else (i.toLong * srcBody / dstBody).toInt
        out(HeaderLen + i) = if (srcBody == 0) 0 else p(HeaderLen + math.min(src, srcBody - 1))
        i += 1
      }
      Media(m.media_id, m.kind, out)
    }
  }

  /** Batched resize stage (mapInPandas-analog, like [[extractFeatures]]):
    * one resizer per partition, iterator-in/iterator-out, payloads stay
    * opaque binary to Spark on both sides — so the stage pipelines and
    * spills without interpreting a byte.
    */
  def resizeAll(media: Dataset[Media], targetW: Int, targetH: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val resizer: MediaResizer = new FakeResizer // per-partition init
      rows.map(m => resizer.resize(m, targetW, targetH))
    }
  }

  /** binaryFile ingest for a real on-disk media corpus: one row per
    * file with (path, modificationTime, length, content), partitions
    * sized by spark.sql.files.maxPartitionBytes — the scale-safe
    * replacement for wholetext on large blobs.
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String): Dataset[Media] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        xxhash64(col("path")).as("media_id"),
        regexp_extract(col("path"), "\\.([a-z0-9]+)$", 1).as("kind"),
        col("content").as("payload"))
      .as[Media]
  }
}
