package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated property tests (SURVEY.md §5.3). Samples are
  * drawn with a fixed seed and evaluated in ONE DataFrame per property
  * (a Spark job per sample would be pathologically slow), then asserted
  * with plain ScalaTest — no scalatest-scalacheck bridge needed.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val pathGen: Gen[String] = for {
    dirs <- Gen.listOf(Gen.alphaNumStr)
    base <- Gen.asciiPrintableStr
    suffix <- Gen.oneOf("", ".html", ".html.html", ".htm")
  } yield dirs.mkString("/", "/", "/") + base + suffix

  private val hostGen: Gen[String] = Gen.oneOf(
    "en.wikipedia.org", "EN.wikipedia.org", "example.com", "a.b.co")
  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS")
    host <- hostGen
    segs <- Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    slashes <- Gen.oneOf("", "/", "//")
    q <- Gen.oneOf("", "?k=v", "#frag", "?a=1#b")
  } yield s"$scheme://$host" + segs.mkString("/", "/", "") + slashes + q

  test("property: sanitizeFilename output is always within [a-zA-Z0-9._-] (utils.py charset)") {
    val in = samples(pathGen)
    val out = evalStr(in, Html.sanitizeFilename(col("s")))
    out.foreach { o =>
      assert(o.asInstanceOf[String].matches("^[a-zA-Z0-9._-]*$"), s"bad sanitize output: $o")
    }
  }

  test("property: sanitizeFilename output never contains '.html'") {
    val in = samples(pathGen)
    val out = evalStr(in, Html.sanitizeFilename(col("s")))
    out.foreach(o => assert(!o.asInstanceOf[String].contains(".html")))
  }

  test("property: normalize is idempotent over generated URLs") {
    val in = samples(urlGen)
    val once = evalStr(in, Urls.normalize(col("s"))).map(_.asInstanceOf[String])
    val twice = evalStr(once, Urls.normalize(col("s"))).map(_.asInstanceOf[String])
    assert(once === twice)
  }

  test("property: normalized URLs have lowercase scheme+host and no trailing slash or query") {
    val in = samples(urlGen)
    val out = evalStr(in, Urls.normalize(col("s"))).map(_.asInstanceOf[String])
    out.foreach { u =>
      val schemeHost = u.takeWhile(_ != '/') + "//" +
        u.dropWhile(_ != '/').drop(2).takeWhile(_ != '/')
      assert(schemeHost === schemeHost.toLowerCase, s"case survived: $u")
      assert(!u.contains("?") && !u.contains("#"), s"query/fragment survived: $u")
      assert(!u.endsWith("/"), s"trailing slash survived: $u")
    }
  }

  test("property: filenameFromUrl ends with .html and contains no [:/?&=]") {
    val in = samples(urlGen)
    val out = evalStr(in, Urls.filenameFromUrl(col("s"))).map(_.asInstanceOf[String])
    out.foreach { f =>
      assert(f.endsWith(".html"), s"no .html suffix: $f")
      assert(!f.dropRight(5).exists(c => ":/?&=".contains(c)), s"unsanitized char in: $f")
    }
  }

  test("property: parseRfc1123 never throws, and round-trips formatRfc1123 for whole-second timestamps") {
    import spark.implicits._
    val tsGen = Gen.choose(0L, 4102444800L) // 1970..2100, seconds
    val secs = samples(tsGen, 100)
    val back = secs.toDF("sec")
      .select(Urls.parseRfc1123(
        Urls.formatRfc1123(timestamp_seconds(col("sec")))).as("r"), col("sec"))
      .collect().toSeq
    back.foreach { r =>
      assert(r.getTimestamp(0) === new java.sql.Timestamp(r.getLong(1) * 1000L))
    }
    // and arbitrary garbage parses to null, not an exception
    val garbage = samples(Gen.asciiPrintableStr, 100)
    val parsed = evalStr(garbage.map(g => s"x$g"), Urls.parseRfc1123(col("s")))
    assert(parsed.forall(_ == null))
  }
}
