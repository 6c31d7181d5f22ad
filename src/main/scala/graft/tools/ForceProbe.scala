package graft.tools

/** One-off measurement probe (round 10): quantify how much `.count()`
  * forcing under-measures vs a full-materialization noop write, per
  * query. count() lets Catalyst prune the plan above the count — a
  * cardinality-preserving left join (l24), a final window with no rank
  * filter (l9/u2), even aggregate VALUE expressions under a groupBy —
  * while the DuckDB side of every BENCHNOTES table fetches all rows.
  * Kept as a tool so the forcing decision stays re-measurable. */
object ForceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("l24_segment_dedup", "u2_scd2", "l9_sequence_pack",
        "q1_pricing_summary", "l22_bpe_tokenize", "l1_exact_dedup",
        "l13b_corpus_export_v2", "w4_running_total", "j1_enrich_details")
    val spark = MakeHeavy.session()
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (n <- names) {
      def df = graft.SparkEntry.queries(n)(spark, dir)
      df.count(); noop(df) // warm both paths
      val c = (1 to 3).map(_ => t(df.count())).min
      val w = (1 to 3).map(_ => t(noop(df))).min
      println(f"FORCE $n%-24s count=$c%6.2f noop=$w%6.2f ratio=${w / c}%5.2f")
    }
    spark.stop()
  }

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
}
