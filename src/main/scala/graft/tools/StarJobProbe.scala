package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.DataFrame

/** Job-level decomposition of the plain star forms on a star tier: per
  * query, print every Spark job's wall + description so the gap between
  * query wall and stage-compute (BenchStar's two columns) is attributed —
  * gate-count job vs broadcast builds vs the fact probe vs AQE floors.
  * Usage: runMain graft.tools.StarJobProbe <tierDir> [q2|q3 ...]
  */
object StarJobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args.drop(1).toSet else Set("q2", "q3")
    val spark = MakeHeavy.session(None)
    spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")

    case class Job(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val d = Option(j.properties).map(_.getProperty("spark.job.description"))
          .flatMap(Option(_)).getOrElse("")
        jobs.put(j.jobId, Job(j.jobId, d.take(90), j.time))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val job = jobs.get(j.jobId); if (job != null) job.end = j.time
      }
    })

    def pq(t: String): DataFrame = spark.read.parquet(s"$dir/$t.parquet")
    val qs: Seq[(String, () => DataFrame)] = Seq(
      "q2" -> (() => graft.operators.Analytics.q2PlainFrom(
        spark, pq("customer"), pq("orders"), pq("lineitem"))),
      "q3" -> (() => graft.operators.Analytics.q3PlainFrom(
        spark, pq("region"), pq("nation"), pq("customer"),
        pq("orders"), pq("lineitem")))
    ).filter(p => which(p._1))

    for ((name, fn) <- qs) {
      graft.BenchUtil.force(fn()) // warmup
      jobs.clear()
      val t0 = System.nanoTime()
      graft.BenchUtil.force(fn())
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"==== $name wall=$wall%.2fs ====")
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      val first = js.headOption.map(_.start).getOrElse(0L)
      for (j <- js)
        println(f"  job ${j.id}%3d +${(j.start - first) / 1e3}%6.2fs dur=${(j.end - j.start) / 1e3}%6.2fs  ${j.desc}")
      val covered = js.map(j => j.end - j.start).sum / 1e3
      println(f"  sum(job walls)=$covered%.2fs  gaps=${wall - covered}%.2fs")
    }
    spark.stop()
  }
}
