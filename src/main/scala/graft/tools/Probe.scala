package graft.tools


/** Dev probe: where does cold-start time go? */
object Probe {
  def main(args: Array[String]): Unit = {
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val spark = t("session create")(graft.GraftSession.local(defaultCpus = 8))
    t("trivial job (range.count)")(spark.range(1000).count())
    t("parquet read + count") {
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    }
    val c = t("cleaned plan build")(graft.etl.Transactions.cleaned(spark, "/root/testdata/sf0.001"))
    t("cleaned materialize (cache)")(c.count())
    t("customer_summary")(graft.etl.Summaries.customerSummary(c).count())
    t("customer_summary again")(graft.etl.Summaries.customerSummary(c).count())
    t("parquet write")(c.limit(100).write.mode("overwrite").parquet("/tmp/probe_out"))
    val tables = t("Pipeline.transform")(graft.etl.Pipeline.transform(spark, "/root/testdata/sf0.001"))
    tables.foreach { case (name, df) =>
      t(s"csv write $name")(df.write.mode("overwrite").option("header", "true").csv(s"/tmp/probe_pipe/csv/$name"))
    }
    tables.foreach { case (name, df) =>
      t(s"parquet write $name")(df.write.mode("overwrite").parquet(s"/tmp/probe_pipe/parquet/$name"))
    }
    tables.foreach { case (name, df) => t(s"count $name")(df.count()) }
    spark.stop()
  }
}
