package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Where does the per-query bench floor go? BENCHNOTES attributes ~17s of
  * the sf0.1 suite total to a ~0.15s/query fixed floor; this probe splits
  * that floor into its phases for a sample of queries so floor-reduction
  * work targets the real term instead of a guess:
  *   build  — DataFrame construction (includes `spark.read.parquet` schema
  *            inference: a driver-side footer read per table reference)
  *   plan   — analysis + optimization + physical planning (executedPlan)
  *   exec   — the count() action itself (job scheduling + tasks)
  * Each phase is the median of `REPS` post-warmup runs on a fresh plan
  * (plans are rebuilt per rep; Spark caches codegen by source, file
  * listings by path — exactly what a repeated-bench sweep sees).
  */
object FloorProbe {
  val REPS = 5
  private def med(v: Seq[Double]): Double = graft.BenchUtil.median(v.toVector)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sample =
      if (args.nonEmpty) args.toSeq
      else Seq("p1_project_code", "q1_pricing_summary", "j3_enrich_reviews",
               "a5b_rollup", "w1_topk_per_group", "l4_text_stats",
               "q3_revenue_by_nation", "set2_intersect")
    val queries = SparkEntry.queries

    // warmup
    sample.foreach(n => queries(n)(spark, sfDir).count())

    println(f"${"query"}%-24s ${"build"}%8s ${"plan"}%8s ${"exec"}%8s ${"total"}%8s")
    sample.foreach { n =>
      val builds, plans, execs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to REPS).foreach { _ =>
        val t0 = System.nanoTime()
        val df = queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        builds += (t1 - t0) / 1e9; plans += (t2 - t1) / 1e9; execs += (t3 - t2) / 1e9
      }
      val (b, p, e) = (med(builds.toSeq), med(plans.toSeq), med(execs.toSeq))
      println(f"$n%-24s $b%8.3f $p%8.3f $e%8.3f ${b + p + e}%8.3f")
    }
    spark.stop()
  }
}
