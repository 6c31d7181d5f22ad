package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One-JVM interleaved A/B of the partitioned-sink pre-write exchange:
  * unsized keyed repartition (AQE may coalesce the tiny exchange to one
  * task → the writer opens every partition dir's file serially) vs the
  * same keys hashed over defaultParallelism tasks. Alternating reps so
  * page-cache and JIT drift hit both arms equally. */
object SinkWidthProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = "/root/repo/target/graft-tmp/sink_width_probe"
    import spark.implicits._
    def slice = graft.operators.Etl.vendorFrame(spark, sf,
      $"o_orderdate" >= lit("2000-03-01").cast("timestamp")
        && $"o_orderdate" < lit("2000-03-03").cast("timestamp"))
    def run(wide: Boolean): Double = {
      val df = if (wide)
        slice.repartition(spark.sparkContext.defaultParallelism,
          col("city_id"), col("day"))
      else slice.repartition(col("city_id"), col("day"))
      val t0 = System.nanoTime()
      graft.Tables.sink(out) {
        df.write.mode(SaveMode.Overwrite)
          .partitionBy("city_id", "year", "month", "day").parquet(out)
      }
      (System.nanoTime() - t0) / 1e9
    }
    run(wide = false); run(wide = true) // warm both plans
    val walls = (1 to 4).flatMap(_ => Seq("narrow" -> run(false), "wide" -> run(true)))
    walls.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (k, vs) =>
      val ws = vs.map(_._2)
      println(f"$k%7s min=${ws.min}%.3f med=${ws.sorted.apply(ws.size / 2)}%.3f all=${ws.map(w => f"$w%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
