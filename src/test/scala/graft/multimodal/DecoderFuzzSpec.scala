package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._
import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

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
    val f = Future(new ImageFileDecoder().decode(Media(id, "fuzz", bytes)))
    try Await.result(f, timeout)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fail(s"decoder hung > $timeout on fuzz case $id (${bytes.length} bytes)")
      // the decode contract: reject via IllegalArgumentException (or
      // a require's IllegalArgumentException subclass); anything else
      // escaping — NPE, ArrayIndexOutOfBounds, NegativeArraySize,
      // OutOfMemory from a crafted geometry — is a parser bug
      case _: IllegalArgumentException => ()
    }
  }

  private def randomBytes(n: Int): Array[Byte] = {
    val a = new Array[Byte](n)
    rnd.nextBytes(a)
    a
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
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(cid: String, data: Array[Byte]): Array[Byte] =
      cid.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val jpegBytes = encoded("jpeg")
    val avi = {
      val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++ chunk("00dc", jpegBytes))
      val body = "AVI ".getBytes("US-ASCII") ++ movi
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val ppm = "P6 4 3 255\n".getBytes("US-ASCII") ++ randomBytes(36)
    val valids = Seq(encoded("png"), encoded("gif"), jpegBytes, avi, ppm)
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
}
