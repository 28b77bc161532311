package graft.tools


/** Scale-rehearsal bench: run a comma-separated list of SparkEntry
  * queries against one corpus dir, print one JSON line of per-query
  * steady-state seconds (min of `passes` noop writes after a warmup
  * pass that also absorbs index build-if-absent and codegen).
  *
  * usage: runMain graft.tools.ScaleBench <dir> <q1,q2,...> [passes]
  *
  * Unlike graft.Bench (the driver's full-suite artifact), this runs on
  * corpora that carry ONLY the documents/embeddings tables — the
  * scripts/gen_scale_corpus.py outputs — so a 10x rehearsal doesn't
  * need the whole TPC-H star generated at 10x.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val passes = if (args.length > 2) args(2).toInt else 2
    require(passes >= 1, s"passes must be >= 1, got $passes")
    val spark = graft.GraftSession.local()
    def once(name: String): Double = {
      // construction INSIDE the timer: queries with eager driver-side
      // stages (the components convergence loop) do their work at
      // construction time, and timing only the final noop would
      // under-measure them (caught in the round-6 rehearsal)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { name =>
      once(name) // warmup: codegen + build-if-absent indexes + caches
      name -> (1 to passes).map(_ => once(name)).min
    }
    val qjson = results
      .map { case (n, s) =>
        s""""$n":${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))}""" }
      .mkString("{", ",", "}")
    println(s"""{"dir":"$dir","queries":$qjson}""")
    spark.stop()
  }
}
