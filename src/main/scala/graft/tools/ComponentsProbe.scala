package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does a dedup_components call spend its time —
  * edge construction (sketch + candidate join + verify) vs the
  * label-propagation rounds? Runs the stages separately, twice each
  * (second run rides the session sketch caches, like bench pass 2).
  *
  * usage: runMain graft.tools.ComponentsProbe <sfDir>
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    for (pass <- 1 to 2) {
      t(s"pass $pass: neardupPairs (edges input)")(
        graft.ops.DedupOps.neardupPairs(spark, sfDir).count())
      t(s"pass $pass: full components query")(
        graft.ops.DedupOps.components(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
