package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-question probe: do CollectMetrics observations fire on an eager
  * `localCheckpoint()` action (the cdfApply delta materialization), and
  * what do they return over an empty frame? The r18 apply-loop fold rides
  * the answer — if the listener did not fire, Observation.get would hang
  * the apply loop forever, so the property is pinned here and in
  * LakehouseSpec before cdfApply trusts it. */
object ObserveCkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "t")
    val obs = Observation()
    val ck = df.observe(obs, count(lit(1)).as("n"),
        count(when($"t" === "a", 1)).as("na"),
        max(when($"k" >= 2L && $"k" <= 3L, 1L).otherwise(0L)).as("h0"))
      .localCheckpoint()
    println("rows=" + ck.count())
    val m = obs.getAsJava
    println("metrics=" + m)
    // empty frame: do aggregates still produce a metrics row?
    val obs2 = Observation()
    val ck2 = df.filter($"k" > 100L)
      .observe(obs2, count(lit(1)).as("n"), max(when($"k" > 0, 1L).otherwise(0L)).as("h"))
      .localCheckpoint()
    println("rows2=" + ck2.count())
    println("metrics2=" + obs2.getAsJava)
    spark.stop()
  }
}
