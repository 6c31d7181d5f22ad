package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window operators (SURVEY.md §2.5) and their deterministic re-keying.
  *
  * W2's global numbering is arrival-order in the reference
  * (main.rs:136-159) — nondeterministic distributed; we order by the
  * stable key instead (SURVEY §4.3). A single unpartitioned window over
  * raw rows is a one-partition sort at scale, so W2 derives the global
  * rank in two phases (per-bucket counts + broadcast prefix-sum + a
  * window partitioned by bucket) and W4 windows a month-level aggregate;
  * neither ever funnels fact rows through one task.
  */
object Windows {

  /** W1: top-K per group — newest 3 events per user (reviews cap analog). */
  def w1TopkPerGroup(spark: SparkSession, sfDir: String): DataFrame =
    w1From(Tables.events(spark, sfDir))

  /** W1 over any events frame: on a table bucketed by `user_id` the
    * window's one exchange disappears (the scan already satisfies the
    * hash distribution; only the cheap per-task sort remains) — the
    * co-located layout a 100 TB deployment uses for per-user windows. */
  def w1From(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id")
    events
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"user_id", $"rk", $"event_id")
      .orderBy($"user_id", $"rk")
  }

  /** W2: 1-based batch numbering by stable key order, page size 48
    * (main.rs:120,136-159).
    *
    * Global rank without a global sort: rows are range-bucketed on the
    * key, so phase 1 computes per-bucket row counts (a tiny aggregate —
    * one row per ~[[W2_BUCKET_WIDTH]] keys), phase 2 prefix-sums those
    * counts into bucket offsets (a window over the bucket table, not the
    * facts), and phase 3 ranks within each bucket in parallel and adds
    * the broadcast offset. No assumption of dense keys; the only
    * single-partition work is the offset prefix-sum over ~N/bucketWidth
    * rows. At 100 TB pick bucketWidth so that table stays ≤ millions of
    * rows (e.g. 1e6 keys/bucket for 1e12-key spaces).
    */
  def w2BatchNumbering(spark: SparkSession, sfDir: String): DataFrame =
    w2BatchNumbering(spark, sfDir, W2_BUCKET_WIDTH)

  /** Range-bucket width for W2's two-phase rank; ~100 pages per bucket
    * keeps the bucket-offset table ≤ N/4800 rows. */
  val W2_BUCKET_WIDTH: Long = graft.sources.Paginated.PAGE_SIZE * 100L

  def w2BatchNumbering(spark: SparkSession, sfDir: String, bucketWidth: Long): DataFrame = {
    import spark.implicits._
    val bucketed = Tables.orders(spark, sfDir)
      .select($"o_orderkey")
      .withColumn("bkt", floor($"o_orderkey" / bucketWidth).cast("long"))
    // phase 1+2: per-bucket counts, then exclusive prefix-sum → offsets.
    // The unpartitioned window here runs over the BUCKET table (tiny).
    val wOff = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy($"bkt")
      .agg(count(lit(1)).as("bkt_cnt"))
      .withColumn("bkt_offset", coalesce(sum($"bkt_cnt").over(wOff), lit(0L)))
      .select($"bkt", $"bkt_offset")
    // phase 3: rank within bucket (partitioned window) + broadcast offset
    val wIn = Window.partitionBy($"bkt").orderBy($"o_orderkey")
    bucketed
      .join(broadcast(offsets), "bkt")
      .withColumn("global_rank", $"bkt_offset" + row_number().over(wIn))
      .withColumn("batch_number",
        (floor(($"global_rank" - 1) / graft.sources.Paginated.PAGE_SIZE) + 1).cast("long"))
      .select($"o_orderkey", $"batch_number")
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

  /** W5 [EXT]: the relative-rank family — ntile / percent_rank /
    * cume_dist per priority class. All three partition by
    * `o_orderpriority` (5 classes, each ~N/5 rows), so per-partition
    * state is one class's rows and the shuffle key matches the window
    * key — the same scale posture as W1/W3. The ORDER BY is total on
    * (o_totalprice DESC, o_orderkey) so rank ties cannot occur and the
    * double-valued ranks are bit-deterministic: percent_rank's
    * (rank-1)/(n-1) and cume_dist's peers/n are each a single IEEE
    * division of exact integers, identical in any engine. */
  def w5RankFamily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey", $"o_orderpriority",
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"o_orderkey")
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
