package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.8): JSON serialize/parse, epoch
  * timestamps, date parts, string templating, url building, arithmetic,
  * array ops, header maps, seeded jitter. All built-in Catalyst
  * expressions — whole-stage-codegen throughout, no UDFs.
  */
object Scalars {

  /** F1: nested value -> JSON text (parquet.rs:29-42 serialize maps). */
  def f1JsonSerialize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        to_json(struct($"event_id", $"event_type")).as("doc"))
      .orderBy($"event_id")
  }

  /** F2: JSON text -> typed struct via from_json (main.rs:227 parse). */
  def f2JsonParse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // per-row JSON parse dominates; spread the unsplittable fixture scan
    Tables.spread(Tables.events(spark, sfDir))
      .select(
        $"event_id",
        from_json($"props", lit("k LONG")).getField("k").as("k"))
      .orderBy($"event_id")
  }

  /** F3: timestamp <-> epoch-seconds round trip (ts_seconds serde,
    * vendor.rs:12-15; parquet.rs:69-75). */
  def f3EpochSeconds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", unix_timestamp($"ts").as("epoch_s"))
      .withColumn("rt", date_format(timestamp_seconds($"epoch_s"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy($"event_id")
  }

  /** F4: partition-key date parts with zero-pad (main.rs:236-244 `{:02}`). */
  def f4DateParts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("y"),
        lpad(month($"o_orderdate").cast("string"), 2, "0").as("m"),
        lpad(dayofmonth($"o_orderdate").cast("string"), 2, "0").as("d"))
      .orderBy($"o_orderkey")
  }

  /** F5: `%Y-%m-%d %H:%M:%S` formatting (main.rs:39). */
  def f5TimestampFormat(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select($"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("formatted"))
      .orderBy($"event_id")
  }

  /** F6: filename/key templating with space->underscore normalization
    * (main.rs:28-33,113,237-244). */
  def f6StringTemplate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select(
        $"c_custkey",
        concat(lit("vendors_city_"),
          regexp_replace(lower($"c_name"), " ", "_"),
          lit("_"), $"c_custkey", lit(".json")).as("filename"))
      .orderBy($"c_custkey")
  }

  /** F7: query-string construction (api.rs:24-29,74-78,153-156,189-193). */
  def f7UrlBuild(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        concat(
          lit("https://host/api/v1/orders?"),
          concat_ws("&",
            concat(lit("key="), $"o_orderkey"),
            concat(lit("status="), $"o_orderstatus"),
            concat(lit("priority="), regexp_replace($"o_orderpriority", " ", "%20"))))
          .as("url"))
      .orderBy($"o_orderkey")
  }

  /** F8: ceil-div pagination arithmetic (main.rs:123; f32 quirk normalized
    * to double — SURVEY §7.4). */
  def f8CeilDiv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .withColumn("pages", ceil($"n_orders".cast("double") / 10.0).cast("long"))
      .orderBy($"o_custkey")
  }

  /** F9: size -> MB integer arithmetic (main.rs:251,261). */
  def f9BytesToMb(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", expr("n_chars div 128").as("blocks"),
        ($"n_chars" % 128).as("rem"))
      .orderBy($"doc_id")
  }

  /** F10: coalesce defaulting over a real miss (nations without suppliers
    * — unwrap_or("Unknown"), vendor.rs:63). */
  def f10CoalesceDefault(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n = Tables.nation(spark, sfDir)
    val s = Tables.supplier(spark, sfDir)
      .groupBy($"s_nationkey").agg(count(lit(1)).as("cnt"))
    n.join(s, $"n_nationkey" === $"s_nationkey", "left_outer")
      .select(
        $"n_nationkey", $"n_name",
        coalesce($"cnt", lit(0L)).as("n_suppliers"))
      .orderBy($"n_nationkey")
  }

  /** F11: array ops — split/size/element_at/sort/slice/join
    * (main.rs:144-147 collect; ratings.rs:19 array). */
  def f11ArrayOps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = split($"text", " ")
    Tables.documents(spark, sfDir)
      .select(
        $"doc_id",
        size(words).cast("long").as("n_words"),
        element_at(words, 1).as("first_word"),
        array_join(slice(array_sort(words), 1, 3), ",").as("sorted_first3"))
      .orderBy($"doc_id")
  }

  /** F12: header map — MapType column with map_* ops (config.rs:23-25).
    * Rendered to sorted text so the result is oracle-comparable. */
  def f12MapHeaders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .withColumn("headers",
        map(lit("accept"), lit("application/json"), lit("segment"), lower($"c_mktsegment")))
      .select(
        $"c_custkey",
        array_join(array_sort(map_keys($"headers")), ",").as("header_keys"),
        element_at($"headers", "segment").as("segment_header"))
      .orderBy($"c_custkey")
  }

  /** F13: seeded jitter — base + prng(key) % span (time.rs:4-7). A keyed
    * LCG instead of rand(): deterministic under any partitioning, which
    * `rand(seed)` is not (it is per-partition seeded). */
  def f13Jitter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        $"event_id",
        // key reduced mod 1e5 before the LCG multiply so the product
        // stays far from Long overflow at any event_id scale
        (lit(2000L) + ((($"event_id" % 100000L) * 1103515245L + 12345L) % 1000L)).as("delay_ms"))
      .orderBy($"event_id")
  }

  /** Morton/Z-order key: interleave the low `bits` of two non-negative
    * ints (a in the even bit positions, b in the odd). Feed the result to
    * [[graft.operators.Etl.clusteredWrite]] to cluster a table on TWO
    * dimensions at once: a range predicate on either dimension then maps
    * to a bounded set of z-ranges, so row-group min/max skipping works for
    * both columns — the standard lakehouse multi-dim layout. Inputs must
    * already be scaled to [0, 2^bits): rank/bucket the raw columns first
    * (z-locality comes from the shared bounded range, not raw magnitudes).
    * Pure bit arithmetic (shift/and/or composed built-ins) — codegen'd,
    * deterministic, and replayable in ANSI SQL by the oracle. */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** F14 [EXT]: z-order key over (order day, customer bucket) — the
    * two-dimensional clustering key for orders. Day since 1995-01-01 and
    * custkey are both folded into 10-bit buckets first. */
  def f14ZorderKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val day = (datediff($"o_orderdate", lit("1995-01-01").cast("timestamp")) % 1024).cast("long")
    val cust = pmod($"o_custkey", lit(1024L))
    Tables.orders(spark, sfDir)
      .select(
        $"o_orderkey",
        day.as("day_bucket"),
        cust.as("cust_bucket"),
        zorderKey(day, cust, 10).as("zkey"))
      .orderBy($"o_orderkey")
  }

  /** F15 [EXT]: edit distance — `levenshtein` is the standard fuzzy
    * string match for entity resolution (vendor-name reconciliation in
    * the reference's domain). Codegen'd built-in, O(|a|·|b|) per row,
    * no shuffle; identical unit-cost insert/delete/substitute definition
    * in DuckDB. */
  def f15Levenshtein(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, sfDir)
      .select($"p_partkey",
        levenshtein($"p_brand", $"p_type").cast("long").as("edit_dist"))
      .orderBy($"p_partkey")
  }
}
