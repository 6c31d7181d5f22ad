package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{BenchUtil, SparkEntry}

/** Local iteration aid: time named SparkEntry queries under the Bench
  * forcing (full materialization to a noop sink), median of 3 after one
  * untimed warmup — the same protocol as graft.Bench, for one query
  * instead of the 40-minute suite. Usage:
  *   sbt "runMain graft.tools.TimeQuery <sfDir> <query> [query ...]"
  */
object TimeQuery {
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
    val queries = SparkEntry.queries
    names.foreach { n =>
      val q = queries(n)
      BenchUtil.force(q(spark, sfDir)) // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        BenchUtil.force(q(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%-28s median=${BenchUtil.median(ts.toVector)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
