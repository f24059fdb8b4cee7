package graft.wiki

import graft.SparkSpec

/** O-27 JDBC load (categorizer.py:82-87's intended-but-unused config):
  * the sandbox has no JDBC driver jar or database server (zero egress),
  * so this asserts the write path is WIRED — plan construction reaches
  * the JDBC connection layer and fails there with the driver-resolution
  * error, not earlier in analysis. The full load is documented in README
  * ("JDBC sink" scope note).
  */
class JdbcSinkSpec extends SparkSpec {

  test("saveToJdbc constructs all three table writes and reaches the connection layer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc-")
    java.nio.file.Files.write(dir.resolve("p.html"),
      ("""<div id="mw-normal-catlinks"><ul><li><a>C1</a></li></ul></div>"""
        ).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val m = Categorize.run(spark, dir.toString)
    val e = intercept[Exception] {
      Categorize.saveToJdbc(m,
        "jdbc:mysql://localhost:3306/wiki", new java.util.Properties())
    }
    // Analysis and planning succeeded; the failure is the absent
    // driver/connection ("No suitable driver" / connect refusal).
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    assert(msg.contains("driver") || msg.contains("connect"),
      s"expected a JDBC-layer failure, got: ${e.getClass.getName}: $msg")
  }
}
