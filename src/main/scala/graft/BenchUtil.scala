package graft

/** Shared bits of the Bench/BenchHeavy sweep harnesses. */
object BenchUtil {

  /** Force FULL evaluation for timing: a noop-sink write materializes
    * every output column of every row. `.count()` — the forcing both
    * harnesses used through round 9 — lets Catalyst optimize the plan
    * ABOVE the count: a cardinality-preserving left join is eliminated
    * outright (l24 measured as a bare scan), a final window with no rank
    * filter is dropped (l9/u2), and even aggregate VALUE expressions
    * under a groupBy are pruned to their keys — while the DuckDB column
    * of every BENCHNOTES table fetches all rows. tools/ForceProbe
    * measured the skew at sf0.1: 1.1-2.7x per query. Round-10 artifacts
    * are regenerated under this forcing; absolute times are therefore
    * NOT comparable to earlier rounds' tables. */
  def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** LOWER median: with an even sample count (a sweep failed) and one
    * contaminated slow sample among the survivors, the upper-middle pick
    * would select the contaminated one — prefer the uncontaminated side.
    * (Odd counts are the true median either way.) */
  def median(v: Vector[Double]): Double = {
    val s = v.sorted
    s((s.size - 1) / 2)
  }

  /** Persist a bench JSON line next to the build (parent dirs created):
    * stdout capture may truncate long lines; the file never does. */
  def writeArtifact(path: String, line: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
  }

  /** One JSON line guaranteed `<= budget` chars for a stdout capture that
    * keeps only the tail of the output (the round driver keeps ~2000).
    * The headline total and failure list always fit; the per-query map is
    * filled slowest-first at 3-decimal precision until the budget is hit,
    * so what gets dropped is the job-floor noise, never the signal. The
    * full-precision map lives in BENCHFULL.json (see "full" field). */
  def compactLine(total: Double, results: Seq[(String, Double)],
                  failed: Seq[String], sfDir: String,
                  sweepWalls: Seq[Double], budget: Int): String = {
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    val head = s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"""" +
      s""","sweep_walls":[${sweepWalls.map(f3).mkString(",")}]""" +
      s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]""" +
      s""","queries_total":${results.size},"full":"BENCHFULL.json","queries":{"""
    val tail = "}}"
    val entries = results.filter(_._2 >= 0).sortBy(-_._2)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    var len = head.length + tail.length
    val kept = entries.takeWhile { e =>
      val fits = len + e.length + 1 <= budget
      if (fits) len += e.length + 1
      fits
    }
    head + kept.mkString(",") + tail
  }
}
