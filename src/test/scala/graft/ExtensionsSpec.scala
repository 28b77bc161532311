package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must make every native function SQL-callable on a
  * fresh session with no per-module register calls, with values
  * identical to the register() path. */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions-installed session evaluates all graft functions") {
    // getOrCreate returns any existing default session (ignoring
    // extensions), so clear the registries first; the builder then
    // creates a FRESH session with extensions applied, reusing the
    // JVM's SparkContext. Never stop() here — that would kill the
    // context shared with the other suites.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
          |  quantize_vec(array(CAST(0.5 AS FLOAT))) AS q,
          |  token_stats('the cat sat') AS ts,
          |  token_fingerprint('a b a') AS tf,
          |  token_shingles('a b c d') AS sh,
          |  simhash_bits('a b c') AS sb
          |""".stripMargin).head()
      assert(r.getAs[Long]("d") === 32L)
      assert(r.getAs[Seq[Long]]("q") === Seq(5000L))
      assert(r.getAs[org.apache.spark.sql.Row]("ts").getAs[Int]("NTokens") === 3)
      assert(r.getAs[org.apache.spark.sql.Row]("tf")
        .getAs[String]("Fingerprint").length === 32)
      assert(r.getAs[Seq[String]]("sh") === Seq("a b c", "b c d"))
      assert(r.getAs[String]("sb").matches("[01]{8}"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
