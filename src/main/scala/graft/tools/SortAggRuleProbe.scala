package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: under what conditions does Spark's
  * ReplaceHashWithSortAgg actually fire? (q2 item-4 investigation) */
object SortAggRuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.execution.replaceHashWithSortAgg", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val a = spark.range(100000).select($"id".as("k"), ($"id" % 7).as("v"))
    val b = spark.range(100000).select(($"id" / 3).cast("long").as("k"), $"id".as("w"))
    val j = a.join(b, "k").groupBy($"k").agg(sum($"w").as("sw"), min($"v").as("mv"))
    println(j.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
