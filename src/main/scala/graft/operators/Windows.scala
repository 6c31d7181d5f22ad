package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window operators (SURVEY.md §2.5) and their deterministic re-keying.
  *
  * W2's global numbering is arrival-order in the reference
  * (main.rs:136-159) — nondeterministic distributed; we order by the
  * stable key instead (SURVEY §4.3). A single unpartitioned window is a
  * one-partition sort at scale, so W2/W4 are documented as driver-side
  * metadata ops (page numbering over page counts, not rows): the row count
  * they act on is the *page* table, orders of magnitude smaller than facts.
  */
object Windows {

  /** W1: top-K per group — newest 3 events per user (reviews cap analog). */
  def w1TopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"user_id", $"rk", $"event_id")
      .orderBy($"user_id", $"rk")
  }

  /** W2: 1-based batch numbering by stable key order, page size 48
    * (main.rs:120,136-159). */
  def w2BatchNumbering(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.orderBy($"o_orderkey")
    Tables.orders(spark, sfDir)
      .select($"o_orderkey")
      .withColumn("batch_number",
        (floor((row_number().over(w) - 1) / graft.sources.Paginated.PAGE_SIZE) + 1).cast("long"))
      .orderBy($"o_orderkey")
  }

  /** W3: per-key lag — seconds since the user's previous event
    * (extraction duration analog, vendor.rs:57,69-70). */
  def w3ExtractionLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
      .select(
        $"event_id", $"user_id",
        ((unix_micros($"ts") - $"prev_us") / lit(1000000L)).cast("long").as("gap_s"))
      .orderBy($"event_id")
  }

  /** W4 [EXT]: running total of orders over months (progress view). The
    * window runs over the aggregated month table (≤ hundreds of rows), not
    * the fact table — scale-safe by construction. */
  def w4RunningTotal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, sfDir)
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy($"month")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("running_n", sum($"n").over(w))
      .orderBy($"month")
  }
}
