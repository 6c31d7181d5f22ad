package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.SparkEntry

/** A/B the per-query bench floor levers (r14 verdict item 1: ~30s of the
  * 108.7s sf0.1 suite is fixed 0.15-0.25s/query job overhead):
  *
  *   force   — noop-sink v2 write (the r10–r14 BenchUtil.force, inlined
  *             here as [[noopWrite]] since r15 moved BenchUtil.force to
  *             the drain — delegating would measure drain vs drain and
  *             erase the very tax this tool documents) vs a raw toRdd
  *             partition drain. Both are FULL materialization — every
  *             operator runs and every output row is produced by the
  *             compiled plan — but the drain skips the v2 write command
  *             machinery (write task setup, commit coordinator
  *             round-trips) that prices in per job, not per row.
  *   AQE     — on (production mirror) vs off: each AQE stage is its own
  *             job, so tiny queries pay scheduling per stage.
  *
  * Prints a wall-time matrix per query plus column totals, medians of
  * REPS runs after one untimed warmup per cell.
  */
object FloorCutProbe {
  val REPS = 5
  private def med(v: Seq[Double]): Double = graft.BenchUtil.median(v.toVector)

  private def drain(df: DataFrame): Unit =
    df.queryExecution.toRdd.foreachPartition { it =>
      while (it.hasNext) it.next()
    }

  /** The r10–r14 forcing under test: full-materialization noop-sink v2
    * write (inlined — BenchUtil.force IS the drain since r15). */
  private def noopWrite(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // floor-bound sample: sub-second rows whose wall is mostly overhead,
    // plus two mid-weight rows as a no-regression control
    val sample =
      if (args.nonEmpty) args.toSeq
      else Seq("p1_project_code", "p4_status_filter", "a1_count_rows",
               "a6_distinct_codes", "a6b_approx_distinct", "set2_intersect",
               "o2_limit", "j1_enrich_details", "w1_topk_per_group",
               "l4_text_stats", "dq2_profile_drift", "u4_snapshot_diff",
               "q1_pricing_summary", "q3_revenue_by_nation")
    val queries = SparkEntry.queries

    // pf = spark.sql.adaptive.coalescePartitions.parallelismFirst: the
    // default (true) keeps >= default-parallelism partitions after
    // coalescing, so a KB-sized shuffle still runs `cpus` tasks; false
    // respects the 64 MB advisory size -> 1 task for tiny shuffles (and
    // is the posture Spark's own docs recommend for busy clusters)
    case class Cell(aqe: Boolean, noop: Boolean, pf: Boolean = true) {
      def label = (if (aqe) "aqe" else "noaqe") +
        (if (pf) "" else "-pf") + "/" + (if (noop) "noop" else "drain")
    }
    val cells = Seq(Cell(true, true), Cell(true, false),
                    Cell(true, true, pf = false), Cell(true, false, pf = false))

    val totals = scala.collection.mutable.Map(cells.map(_.label -> 0.0): _*)
    println(f"${"query"}%-24s" + cells.map(c => f"${c.label}%12s").mkString)
    sample.foreach { n =>
      val row = cells.map { c =>
        spark.conf.set("spark.sql.adaptive.enabled", c.aqe.toString)
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.parallelismFirst", c.pf.toString)
        def run(): Unit = {
          val df = queries(n)(spark, sfDir)
          if (c.noop) noopWrite(df) else drain(df)
        }
        try run() catch { case e: Throwable =>
          println(s"  [$n ${c.label}] failed: ${e.getClass.getSimpleName}")
        } // warmup
        val ts = (1 to REPS).map { _ =>
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        val m = med(ts)
        totals(c.label) += m
        m
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(f"$n%-24s" + row.map(v => f"$v%12.3f").mkString)
    }
    println(f"${"TOTAL"}%-24s" + cells.map(c => f"${totals(c.label)}%12.3f").mkString)
    spark.stop()
  }
}
