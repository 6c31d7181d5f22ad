package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Heavy bench tier: the sf0.1 fixture replicated `copies`x with key
  * shifting (≈ sf1 at the default 10), so the 2x-of-baseline comparison
  * measures COMPUTE, not the ~0.15s fixed per-job submission floor that
  * dominates 80 tiny queries (BENCHNOTES.md).
  *
  * `MakeHeavy` materializes the scaled tables; `BenchHeavy` times the most
  * expensive queries on them (median of 3 after warmup) and prints the same
  * one-line JSON contract as graft.Bench. tools/bench_compare.py --out
  * turns that + the DuckDB oracle into BENCHNOTES_HEAVY.md.
  */
object MakeHeavy {

  /** Key shifts per replica: large strides keep replica key ranges
    * disjoint, so the join structure (orders⋈customer, lineitem⋈orders)
    * replicates exactly — each replica is an independent copy of the
    * economy, which is how real data grows (new entities, not denser
    * relations among old ones). */
  private val SHIFT_ORDER = 10000000L
  private val SHIFT_CUST = 1000000L
  private val SHIFT_DOC = 1000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/root/repo/target/bench_heavy/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = session()
    import spark.implicits._
    val reps = broadcast(spark.range(copies).toDF("k"))

    def scaled(table: String, shifts: Map[String, Long]): DataFrame = {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(s) => (col(c) + $"k" * s).as(c)
          case None => col(c)
        }
      }
      df.crossJoin(reps).select(cols.toSeq: _*)
    }

    scaled("orders", Map("o_orderkey" -> SHIFT_ORDER, "o_custkey" -> SHIFT_CUST))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    scaled("customer", Map("c_custkey" -> SHIFT_CUST))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    scaled("lineitem", Map("l_orderkey" -> SHIFT_ORDER))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // documents: shift ids AND make the text replica-distinct by suffixing
    // every word with the replica tag — shingles/terms never collide across
    // replicas, so near-dup pair volume scales linearly (as a real corpus
    // does), not quadratically from 10 verbatim copies of every doc.
    spark.read.parquet(s"$src/documents.parquet")
      .crossJoin(reps)
      .select(
        ($"doc_id" + $"k" * SHIFT_DOC).as("doc_id"),
        expr("array_join(transform(split(text, ' '), w -> concat(w, '_', k)), ' ')").as("text"),
        $"lang", $"source", ($"n_chars" + 0L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    for (t <- Seq("region", "nation", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"HEAVY_DATA_AT=$out copies=$copies")
    spark.stop()
  }

  private[tools] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

object BenchHeavy {

  /** The queries whose sf0.1 cost is dominated by compute, not the job
    * floor (BENCHNOTES.md top of table). */
  val HEAVY_QUERIES: Seq[String] = Seq(
    "l2d_ngram_jaccard", "l2e_connected_components", "l2b_lsh_candidates",
    "l7_tfidf_topterms", "q1_pricing_summary", "q2_shipping_priority",
    "q3_revenue_by_nation", "s5_s6_partitioned_sink", "l1_exact_dedup")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bench_heavy/sf1")
    val spark = MakeHeavy.session()
    // track genuine executor stage time per query: deep plans (q2/q3's
    // broadcast-dim chains) pay a fixed ~2-3s driver/AQE stage-scheduling
    // floor per run that is invariant to data size; reporting both wall
    // and stage-compute time keeps the 2x-of-baseline gate honest at any
    // local scale factor
    val stageMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val st = s.stageInfo
        for (c <- st.completionTime; b <- st.submissionTime) stageMs.addAndGet(c - b)
      }
    })
    for (name <- HEAVY_QUERIES) // warmup: JIT + codegen + file listing
      graft.SparkEntry.queries(name)(spark, dir).count()
    val results = HEAVY_QUERIES.map { name =>
      val runs = (1 to 3).map { _ =>
        stageMs.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain stage-completed events
        (wall, stageMs.get() / 1e3)
      }
      val byWall = runs.sortBy(_._1)
      name -> byWall(1) // median run's (wall, stage-compute)
    }
    val qs = results.map { case (k, (w, _)) => s"\"" + k + "\":" + w }
      .mkString("{", ",", "}")
    val cs = results.map { case (k, (_, c)) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    println(s"""{"metric":"heavy_total","value":${results.map(_._2._1).sum},"unit":"sec","queries":$qs,"stage_compute":$cs,"sf":"$dir"}""")
    spark.stop()
  }
}
