package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{BenchUtil, SparkEntry}

/** The steady-state number a SERVING deployment sees (r13 verdict item
  * 4): the bench tables price s11_warm_read / mv1_warm_refresh as one
  * isolated read each — ~0.8s of per-JOB floor over ~0.1s of work —
  * which overstates what a session that serves N consecutive reads
  * pays. This probe runs `REPS` consecutive executions of each named
  * query in ONE session and splits:
  *   first    — the session's first read (cold driver caches: parquet
  *              footers, file listings, codegen, manifest replay)
  *   marginal — median of the remaining reads (what read k costs once
  *              the session is warm; the per-read price of a serving
  *              loop)
  * Wall and executor-stage seconds both reported, so the split shows
  * whether the marginal cost is compute or residual scheduling floor.
  * Usage: sbt "runMain graft.tools.WarmProbe <sfDir> <query> [query ...]"
  */
object WarmProbe {
  val REPS = 12

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
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
    val stageMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val st = s.stageInfo
        for (c <- st.completionTime; b <- st.submissionTime) stageMs.addAndGet(c - b)
      }
    })
    val queries = SparkEntry.queries
    names.foreach { n =>
      val q = queries(n)
      val runs = (1 to REPS).map { _ =>
        stageMs.set(0)
        val t0 = System.nanoTime()
        BenchUtil.force(q(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // drain stage-completed events
        (wall, stageMs.get() / 1e3)
      }
      val first = runs.head
      val rest = runs.drop(2) // run 2 still pays stragglers of run 1's warmup
      val mWall = BenchUtil.median(rest.map(_._1).toVector)
      val mStage = BenchUtil.median(rest.map(_._2).toVector)
      println(f"WARMPROBE $n%-24s first=${first._1}%.3f/${first._2}%.3f  " +
        f"marginal=$mWall%.3f/$mStage%.3f (wall/stage s, n=${rest.size})  " +
        s"walls=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
