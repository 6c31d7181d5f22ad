package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: run named queries repeatedly, print timings and
  * optionally the formatted plan. Usage:
  *   runMain graft.tools.Profile <sfDir> <reps> <name> [name ...]
  *   runMain graft.tools.Profile <sfDir> explain <name>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args(1) == "explain") {
      args.drop(2).foreach { name =>
        println(s"==== $name ====")
        println(graft.SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    } else if (args(1) == "etl") {
      import org.apache.spark.sql.functions._
      def time[T](label: String)(f: => T): Unit = {
        val t0 = System.nanoTime(); f
        println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val vf = graft.operators.Etl.vendorFrame(spark, sfDir,
        year(col("o_orderdate")) === 2000 && month(col("o_orderdate")) === 3)
      time("count only")(vf.count())
      time("count only (2nd)")(vf.count())
      time("write flat")(vf.write.mode("overwrite").parquet("/root/repo/target/graft-tmp/flat"))
      time("write repart+partitionBy")(
        vf.repartition(col("city_id"), col("day")).write.mode("overwrite")
          .partitionBy("city_id", "year", "month", "day")
          .parquet("/root/repo/target/graft-tmp/part"))
      time("write partitionBy only")(
        vf.write.mode("overwrite")
          .partitionBy("city_id", "year", "month", "day")
          .parquet("/root/repo/target/graft-tmp/part2"))
      time("readback group")(
        spark.read.parquet("/root/repo/target/graft-tmp/part")
          .groupBy("city_id", "day").count().count())
    } else {
      val reps = args(1).toInt
      args.drop(2).foreach { name =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
