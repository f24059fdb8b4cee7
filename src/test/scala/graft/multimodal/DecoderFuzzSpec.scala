package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import scala.concurrent.duration._

/** Fuzz contract for [[ImageFileDecoder]] on untrusted crawl bytes:
  * every input either decodes or is REJECTED LOUDLY within a time
  * bound — never a hang (the round-9 FDICT inflate-spin class), never
  * an uncontrolled error type, never an OOM-sized allocation from a
  * crafted header (geometry guards).
  *
  * Two generators: (1) pure random bytes, optionally prefixed with
  * each container's magic so the per-format parsers (not just the
  * sniffer) see hostile input; (2) random single-byte mutations of
  * VALID files from every supported format — the corruption shape a
  * real crawl actually produces (truncation, bit rot, proxy
  * mangling). Each decode runs on a future with a hard timeout so a
  * parser loop that stops advancing fails the suite instead of
  * wedging it.
  */
class DecoderFuzzSpec extends SparkSpec {

  private val timeout = 15.seconds

  // deterministic PRNG — failures must reproduce
  private val rnd = new scala.util.Random(0x9E3779B97F4A7C15L)

  private def decodeBounded(id: Long, bytes: Array[Byte]): Unit = {
    // Each decode gets its OWN single-thread executor, shutdownNow()'d
    // on timeout: the decode loops are CPU-bound, so a genuinely
    // non-terminating parser on a shared pool would keep spinning after
    // the timeout and starve later cases into cascading timeouts,
    // obscuring the real offender (round-9 advice). The interrupt can't
    // stop a tight loop, but the daemon thread is abandoned in
    // isolation — one hang costs one thread, not the pool.
    import java.util.concurrent._
    val exec = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, s"fuzz-$id"); t.setDaemon(true); t
    })
    val fut = exec.submit(new Callable[Unit] {
      def call(): Unit = { new ImageFileDecoder().decode(Media(id, "fuzz", bytes)); () }
    })
    try fut.get(timeout.toSeconds, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        fail(s"decoder hung > $timeout on fuzz case $id (${bytes.length} bytes)")
      // the decode contract: reject via IllegalArgumentException (or
      // a require's IllegalArgumentException subclass); anything else
      // escaping — NPE, ArrayIndexOutOfBounds, NegativeArraySize,
      // StackOverflow, OutOfMemory from a crafted geometry — is a
      // parser bug
      case e: ExecutionException =>
        e.getCause match {
          case _: IllegalArgumentException => ()
          case other => throw other
        }
    } finally exec.shutdownNow()
  }

  private def expectReject(id: Long, bytes: Array[Byte], msgPart: String): Unit = {
    val e = intercept[IllegalArgumentException] {
      new ImageFileDecoder().decode(Media(id, "fuzz", bytes))
    }
    assert(e.getMessage.contains(msgPart),
      s"case $id rejected with the wrong message: ${e.getMessage}")
  }

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    rnd.nextBytes(a)
    a
  }

  // RIFF construction kit, shared by the mutation and structure tests
  private def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def chunk(cid: String, data: Array[Byte]): Array[Byte] =
    cid.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
      (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
  private def aviOf(frameChunks: Array[Byte]*): Array[Byte] = {
    val movi = chunk("LIST",
      "movi".getBytes("US-ASCII") ++ frameChunks.flatten.toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }
  private def jpegOf(w: Int, h: Int): Array[Byte] = {
    val b = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      b.setRGB(x, y, ((x * 37) << 16) | ((y * 53) << 8) | ((x + y) * 11 & 0xff))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(b, "jpeg", bos))
    bos.toByteArray
  }

  test("random bytes behind each container magic reject loudly, within the time bound") {
    val magics = Seq(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "P6 ".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      "RIFF1234WAVE".getBytes("US-ASCII"),
      "RIFF1234AVI ".getBytes("US-ASCII"),
      "fLaC".getBytes("US-ASCII"),
      Array.emptyByteArray) // sniffer itself
    var id = 1000L
    for (m <- magics; size <- Seq(0, 3, 64, 4096); _ <- 1 to 25) {
      decodeBounded(id, m ++ randomBytes(size)); id += 1
    }
  }

  test("single-byte mutations of valid files in every format reject or decode, never hang") {
    import java.awt.image.BufferedImage
    def img(w: Int, h: Int): BufferedImage = {
      val b = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w)
        b.setRGB(x, y, ((x * 37) << 16) | ((y * 53) << 8) | ((x + y) * 11 & 0xff))
      b
    }
    def encoded(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img(24, 16), fmt, bos))
      bos.toByteArray
    }
    val jpegBytes = encoded("jpeg")
    val avi = aviOf(chunk("00dc", jpegBytes))
    val ppm = "P6 4 3 255\n".getBytes("US-ASCII") ++ randomBytes(36)
    // compressed-audio WAVs (round-11 codecs): mu-law and a one-block
    // mono IMA ADPCM file (any nibble pattern is valid ADPCM data, so
    // a random body exercises the decode loop, not just the header)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def wavOf(tag: Int, ba: Int, bits: Int, ext: Array[Byte], data: Array[Byte]) = {
      val fmtBody = le16(tag) ++ le16(1) ++ le32(8000) ++ le32(8000 * ba) ++
        le16(ba) ++ le16(bits) ++ ext
      val body = "WAVE".getBytes("US-ASCII") ++ chunk("fmt ", fmtBody) ++
        chunk("data", data)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val ulawWav = wavOf(7, 1, 8, Array.emptyByteArray, randomBytes(32))
    val adpcmBody = { val b = randomBytes(12); b(2) = 40; b(3) = 0; b }
    val adpcmWav = wavOf(0x11, 12, 4, le16(2) ++ le16(17), adpcmBody)
    // a valid FLAC stream (verbatim subframe so any PCM is encodable
    // without a predictor): STREAMINFO + one 16-sample mono frame
    val flacFixture: Array[Byte] = {
      val bits = new java.io.ByteArrayOutputStream()
      var cur = 0; var n = 0
      def wb(v: Long, w: Int): Unit = {
        var i = w - 1
        while (i >= 0) {
          cur = (cur << 1) | ((v >> i) & 1L).toInt; n += 1
          if (n == 8) { bits.write(cur); cur = 0; n = 0 }
          i -= 1
        }
      }
      val pcm = Array.tabulate(16)(i => (i * 731 - 4000) & 0xffff)
      wb(0x664c6143L, 32) // fLaC
      wb(1, 1); wb(0, 7); wb(34, 24)
      wb(16, 16); wb(16, 16); wb(0, 24); wb(0, 24)
      wb(8000, 20); wb(0, 3); wb(15, 5); wb(16, 36)
      for (_ <- 0 until 16) wb(0, 8) // md5 zero -> self-check skipped
      val head = bits.size
      wb(0x3ffe, 14); wb(0, 1); wb(0, 1); wb(7, 4); wb(0, 4); wb(0, 4); wb(4, 3); wb(0, 1)
      wb(0, 8); wb(15, 16) // frame 0, blocksize-1
      wb(Flac.crc8(bits.toByteArray, head, bits.size), 8)
      wb(0, 1); wb(1, 6); wb(0, 1) // VERBATIM subframe
      pcm.foreach(v => wb(v, 16))
      // verbatim 16x16 bits stays byte-aligned; frame CRC
      wb(Flac.crc16(bits.toByteArray, head, bits.size), 16)
      bits.toByteArray
    }
    assert(new ImageFileDecoder().decode(Media(4999L, "audio", flacFixture)).height == 16,
      "fuzz FLAC fixture must itself be valid")
    val valids = Seq(encoded("png"), encoded("gif"), jpegBytes, avi, ppm,
      ulawWav, adpcmWav, flacFixture)
    var id = 5000L
    for (v <- valids; _ <- 1 to 200) {
      val m = v.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      decodeBounded(id, m); id += 1
      // truncations at random points, same contract
      decodeBounded(id, v.take(rnd.nextInt(v.length))); id += 1
    }
  }

  test("AVI RIFF structure attacks: boundary, nesting, duplication, geometry") {
    val jpegA = jpegOf(24, 16)
    val jpegB = jpegOf(16, 8)
    val dec = new ImageFileDecoder()

    // baseline: two same-geometry frames decode, mean over both frames
    val two = dec.decode(Media(1L, "video",
      aviOf(chunk("00dc", jpegA), chunk("01dc", jpegA))))
    assert(two.width === 24 && two.height === 16)

    // a duplicated movi LIST is structurally legal RIFF — frames from
    // both lists count (4 frames, same geometry)
    val movi = chunk("LIST",
      "movi".getBytes("US-ASCII") ++ chunk("00dc", jpegA) ++ chunk("01dc", jpegA))
    val dupBody = "AVI ".getBytes("US-ASCII") ++ movi ++ movi
    val dupMovi = "RIFF".getBytes("US-ASCII") ++ le32(dupBody.length) ++ dupBody
    assert(dec.decode(Media(2L, "video", dupMovi)).width === 24)

    // geometry-mismatched frames must reject with the geometry message
    expectReject(3L, aviOf(chunk("00dc", jpegA), chunk("01dc", jpegB)),
      "disagree on geometry")

    // '##db' carrying a non-JPEG (DIB-style) payload: scope message,
    // not a JPEG marker-sync error (round-9 advice; regression fixture)
    expectReject(4L, aviOf(chunk("00db", randomBytes(64))),
      "only MJPEG AVI is supported")

    // an oversized chunk length overruns its enclosing list
    expectReject(5L, aviOf(
      chunk("00dc", jpegA).patch(4, le32(Int.MaxValue), 4)), "overruns")

    // a LIST too short to carry its form type
    val shortList = {
      val body = "AVI ".getBytes("US-ASCII") ++
        "LIST".getBytes("US-ASCII") ++ le32(2) ++ Array[Byte](1, 2)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    expectReject(6L, shortList, "too short for a form type")

    // only zero-length / non-frame chunks inside movi: no frames
    expectReject(7L, aviOf(chunk("00dc", Array.emptyByteArray),
      chunk("idx1", randomBytes(16))), "without MJPEG frame chunks")

    // pathological nesting must hit the depth guard, not blow the stack
    // (the recursive walk had no bound — a crafted file nested ~10k+
    // deep would StackOverflowError, an Error outside the reject-loudly
    // contract; the guard at 16 makes 1000 levels equivalent evidence)
    val deep = {
      var inner = chunk("00dc", Array[Byte](1, 2, 3, 4))
      (1 to 1000).foreach { _ =>
        inner = chunk("LIST", "rec ".getBytes("US-ASCII") ++ inner)
      }
      val body = "AVI ".getBytes("US-ASCII") ++ inner
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    expectReject(8L, deep, "nesting deeper than 16")

    // length-field fuzz sweep: every interesting value in every length
    // slot of a valid file rejects-or-decodes within the bound
    val valid = aviOf(chunk("00dc", jpegA))
    val lenOffsets = Seq(4, 16, 28) // RIFF len, movi LIST len, 00dc len
    val evil = Seq(0, 1, 2, 3, 4, 7, 8, jpegA.length - 1, jpegA.length + 1,
      0x7fffffff, -1) // -1 = 0xffffffff unsigned
    var id = 9000L
    for (off <- lenOffsets; v <- evil) {
      decodeBounded(id, valid.clone().patch(off, le32(v), 4)); id += 1
    }
    // random 4-byte splats anywhere in the header region, same contract
    for (_ <- 1 to 300) {
      val m = valid.clone()
      val pos = rnd.nextInt(m.length - 4)
      decodeBounded(id, m.patch(pos, randomBytes(4), 4)); id += 1
    }
  }
}
