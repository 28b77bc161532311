package graft.tools


/** Dev tool: dissect one query's cost — count vs noop, cache state.
  * usage: runMain graft.tools.BenchOne <sfDir> <query>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = graft.GraftSession.local()
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[benchone] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    t("cleaned cache materialize")(graft.etl.Transactions.cleaned(spark, sfDir).count())
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    t("first noop (codegen+jit)")(df.write.format("noop").mode("overwrite").save())
    t("count 1")(df.count())
    t("count 2")(df.count())
    t("noop 1")(df.write.format("noop").mode("overwrite").save())
    t("noop 2")(df.write.format("noop").mode("overwrite").save())
    t("noop 3")(df.write.format("noop").mode("overwrite").save())
    val plan = df.queryExecution.executedPlan.toString
    println("[benchone] InMemoryTableScan in plan: " + plan.contains("InMemoryTableScan"))
    spark.stop()
  }
}
