package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one per forked test JVM) —
  * built by [[GraftSession]] so every spec runs at the exact engine
  * session settings (and the builder itself is under test). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(defaultCpus = 4)

  val sfDir = "/root/testdata/sf0.001"

  /** Set session confs for the duration of `body`, restoring (or
    * unsetting) the previous values even on failure. */
  def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
