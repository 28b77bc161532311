package graft.tools


/** Measurement probe for the trained language-ID classifier
  * (TextOps.langidTrained) over gen_scale_corpus.py corpora with
  * planted per-language vocabularies: prints accuracy, the label-prior
  * baseline, and wall time per corpus dir — the committed numbers in
  * PERFORMANCE.md's round-10 langid section.
  *
  * Usage: runMain graft.tools.LangidAccuracyProbe <corpusDir>...
  */
object LangidAccuracyProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local()
    args.foreach { d =>
      val t0 = System.nanoTime()
      val rows = graft.ops.TextOps.langidTrained(spark, d).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val acc = rows.count(_.getAs[Boolean]("IsMatch")).toDouble / rows.length
      val prior = rows.groupBy(_.getAs[String]("ActualLang"))
        .values.map(_.size).max.toDouble / rows.length
      val perLang = rows.groupBy(_.getAs[String]("ActualLang")).toSeq.sortBy(_._1)
        .map { case (l, rs) =>
          f"$l=${rs.count(_.getAs[Boolean]("IsMatch")).toDouble / rs.size}%.3f" }
        .mkString(" ")
      println(f"[langid] $d n=${rows.length} acc=$acc%.4f prior=$prior%.4f " +
        f"wall=$sec%.1f s | $perLang")
    }
    spark.stop()
  }
}
