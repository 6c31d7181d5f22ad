package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-quality and change-data-capture operators — the two table-health
  * primitives every production ETL grows around the core pipeline (the
  * reference validates row shape ad hoc at parse time, extractor.rs; here
  * validation is a declarative aggregate the optimizer can fuse).
  */
object Quality {

  /** DQ1 [EXT]: one-pass table profile — row count, null counts, exact
    * key cardinality, duplicate-key count, domain-violation count, and
    * the observed ts range, all as ONE aggregate over one scan. Every
    * term except the exact distinct is algebraic (map-side partials);
    * the distinct shuffles only the 8-byte key column. At 100 TB this is
    * a single pass + one key-column shuffle — the profile never costs
    * more than the cheapest groupBy on the same table. */
  def dq1QualityProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count($"props")).as("null_props"),
        countDistinct($"event_id").as("distinct_ids"),
        (count(lit(1)) - countDistinct($"event_id")).as("dup_ids"),
        sum(when($"value" < 0.0, 1L).otherwise(0L)).as("neg_values"),
        min(unix_micros($"ts")).as("min_ts_us"),
        max(unix_micros($"ts")).as("max_ts_us"))
  }

  /** U1 [EXT]: latest-wins compaction — the CDC/upsert primitive: keep
    * each key's most recent row (snapshot ⊎ updates → next snapshot).
    * One hash shuffle on the compaction key, then a per-key window whose
    * state is one group's rows; ties on ts broken by event_id so the
    * survivor is deterministic. At 100 TB this is the standard
    * merge-on-read compaction shape; pre-bucketing the snapshot on the
    * key (BucketingSpec) removes even this single exchange on repeated
    * runs. */
  def u1LatestWins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
      .orderBy($"user_id", $"event_type")
  }

  /** U2 [EXT]: SCD type-2 history build — the full-history companion to
    * [[u1LatestWins]]: instead of keeping only the latest row per entity
    * attribute, emit every version with its validity interval
    * [valid_from, valid_to) — valid_to is the NEXT change's timestamp
    * (epoch micros, engine-exact), null while current — plus a dense
    * version number and the is_current flag. Ordering inside an entity is
    * total (ts, then event_id), so versions are deterministic under ties.
    *
    * Scale: one hash exchange on the entity key and a per-partition sort
    * — identical to u1's merge-on-read shape; lead() needs no second
    * pass. Pre-bucketing the snapshot on (user_id) removes the exchange
    * on repeated compactions (BucketingSpec's idiom). History size is
    * input size: no fan-out, no driver state. */
  def u2Scd2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // ordering over the projected micros column (ts orders identically)
    // so row_number and lead share one partition sort
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"valid_from_us".asc, $"event_id".asc)
    Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"event_id", $"value",
        expr("unix_micros(ts)").as("valid_from_us"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_us", lead($"valid_from_us", 1).over(w))
      .withColumn("is_current", $"valid_to_us".isNull)
      .select($"user_id", $"event_type", $"version", $"event_id", $"value",
        $"valid_from_us", $"valid_to_us", $"is_current")
      .orderBy($"user_id", $"event_type", $"version")
  }
}
