package graft
import org.apache.spark.sql.SparkSession
import scala.util.Try

/** Round benchmark: one JSON line with per-query medians.
  *
  * Timing strategy: pass-major interleaving. The whole suite is swept
  * end-to-end `SWEEPS` times and each query's median is taken across the
  * temporally separated sweeps. A contention window on the host (GC storm,
  * noisy neighbor, page-cache churn) that outlasts several queries then
  * corrupts at most ONE sample per query — which the median rejects —
  * instead of all three back-to-back samples as in the old per-query
  * median-of-3 scheme (which recorded sustained contention as regression
  * in rounds 2 and 3). Per-sweep wall time and /proc/loadavg are emitted
  * so a contaminated sweep is diagnosable from the artifact itself.
  *
  * Failures are recorded explicitly: a query that throws contributes NO
  * timing sample; if it fails in every sweep it appears as -1 in
  * "queries" and in the "failed" list, rather than a plausible-looking
  * time-to-exception.
  */
object Bench {
  val SWEEPS = 3

  private def loadavg(): String =
    Try(scala.io.Source.fromFile("/proc/loadavg").mkString.trim).getOrElse("")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // experiment knob: AQE re-plans cost extra per-query overhead on
      // tiny local data; default mirrors production (GraftSession: on)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // the one production AQE knob the star plans depend on (GraftSession
      // rationale): hash-join instead of sorting when every build-side
      // partition measures under the gate
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      // STATIC conf: the whole-stage-codegen class cache defaults to 100
      // entries — a 170-query suite evicts every compiled class before
      // its next sweep reuses it, so the untimed warmup's compile work
      // was silently re-paid inside every timed sweep (isolated-JVM rows
      // measured 30-100% faster than their in-sweep medians before this;
      // a workload with more distinct plans than the default cache must
      // size it, same as any production deployment would)
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries // bind once: SparkEntry.queries is a def
    // optional trailing args: sweep only these queries (the incremental
    // path — merge the subset line into the full artifact with
    // tools/merge_bench.py, the BenchHeavy recipe)
    val names =
      if (args.isEmpty) queries.keys.toSeq
      else {
        val unknown = args.toSet -- queries.keySet
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        args.toSeq
      }
    // warmup sweep: JIT + codegen compile, file-listing caches; untimed
    names.foreach { n =>
      try BenchUtil.force(queries(n)(spark, sfDir)) catch { case _: Throwable => () }
    }
    // samples(name) = successful wall times, one per sweep at most
    val samples = scala.collection.mutable.Map(names.map(_ -> Vector.empty[Double]): _*)
    // per-query plan metrics from the last successful run (host-invariant
    // regression signal: exchange bytes / spill / scan count are plan
    // properties, not box properties — tools/bench_drift.py diffs them
    // round-over-round where walls are uninterpretable under the ±25%
    // per-round host drift). Read off the SAME QueryExecution the drain
    // executed; a metrics extraction failure degrades to -1s, never to a
    // failed query (the Observe contract).
    val plans = scala.collection.mutable.Map.empty[String, (Long, Long, Long, Long)]
    val sweepMeta = (1 to SWEEPS).map { _ =>
      val la = loadavg()
      val s0 = System.nanoTime()
      names.foreach { n =>
        val t0 = System.nanoTime()
        val done = try {
          val df = queries(n)(spark, sfDir)
          BenchUtil.force(df)
          Some(df)
        } catch { case _: Throwable => None }
        val wall = (System.nanoTime() - t0) / 1e9 // metric walk NOT timed
        done.foreach { df =>
          samples(n) :+= wall
          plans(n) = Observe.planMetrics(df.queryExecution)
        }
      }
      val wall = (System.nanoTime() - s0) / 1e9
      (wall, la, loadavg())
    }
    val results = names.map { n =>
      val v = samples(n)
      n -> (if (v.isEmpty) -1.0 else BenchUtil.median(v))
    }
    val failed = results.collect { case (n, t) if t < 0 => n }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.collect { case (_, t) if t >= 0 => t }.sum
    val sweeps = sweepMeta.map { case (w, la0, la1) =>
      s"""{"wall":$w,"loadavg_pre":"$la0","loadavg_post":"$la1"}"""
    }.mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // plan-metric map: {"name":[rows,exchange_bytes,spill_bytes,scans]}
    val planJson = names.flatMap(n => plans.get(n).map { case (r, x, sp, sc) =>
      "\"" + n + s"\":[$r,$x,$sp,$sc]"
    }).mkString("{", ",", "}")
    val planTotals = {
      val vs = plans.values.toSeq
      def t(f: ((Long, Long, Long, Long)) => Long) = vs.map(f).filter(_ >= 0).sum
      (t(_._2), t(_._3), t(_._4))
    }
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","sweeps":$sweeps,"failed":$failedJson,"plan":$planJson}"""
    // The driver's artifact capture keeps only the last ~2000 chars of
    // stdout (BENCH_r07/r08 recorded `parsed: null` with a mid-line
    // "tail"), so the full ~4k-char per-query map is unparseable there.
    // Persist the full line to files and print a compact line guaranteed
    // to fit the capture window: total first, then per-query medians
    // filled slowest-first (3 decimals) until the budget is reached — the
    // omitted entries are the sub-0.1s job-floor queries.
    // a subset run stages to its own artifact — BENCHFULL.json stays the
    // full-suite line (merge subsets in with tools/merge_bench.py)
    BenchUtil.writeArtifact(
      if (args.isEmpty) "target/bench.json" else "target/bench.subset.json",
      fullLine)
    if (args.isEmpty) BenchUtil.writeArtifact("BENCHFULL.json", fullLine)
    println(BenchUtil.compactLine(total, results, failed, sfDir,
      sweepMeta.map(_._1), budget = 1850, planTotals = Some(planTotals)))
    spark.stop()
  }
}
