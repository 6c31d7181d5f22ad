package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All operators take `(SparkSession, sfDir)` and read from here, so the
  * same code runs at any scale factor. At cluster scale the same call sites
  * point at the production lake paths — nothing here materializes on the
  * driver.
  */
object Tables {
  val starSchema: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = starSchema ++ Seq("events", "documents", "embeddings")

  /** Parquet schema memo, keyed by path. `spark.read.parquet` without an
    * explicit schema runs footer inference on the DRIVER on every call —
    * measured at ~25 ms per table reference (tools.FloorProbe: the "build"
    * phase is 0.09-0.42 s/query, ~11 s of the sf0.1 suite total, with
    * 5-table joins like q3 paying 5 inferences). A real deployment reads
    * catalog tables whose schema is declared once in the metastore;
    * memoizing the first inference per path gives the library the same
    * read-path cost without a catalog. Safe because the fixture files are
    * immutable for the life of the JVM; sink read-backs (Etl) use the memo
    * too, but every sink write calls [[invalidate]] on its path first —
    * a rewritten schema is re-inferred, never served stale.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Drop the memoized schema for a path. Sinks call this after (re)writing
    * a path so the next [[readMemo]] re-infers from the fresh footers. */
  def invalidate(path: String): Unit = schemaMemo.remove(path)

  /** Read a parquet path with per-JVM schema memoization (first call
    * infers, later calls skip straight to the scan). */
  def readMemo(spark: SparkSession, path: String): DataFrame = {
    val s = schemaMemo.computeIfAbsent(path, p => spark.read.parquet(p).schema)
    spark.read.schema(s).parquet(path)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    readMemo(spark, s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  /** The events fixture stores `ts` as Parquet TIMESTAMP(NANOS), which
    * Spark's TimestampType (micros) rejects outright. The session must be
    * built with `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * GraftSession.tunedConf and the Verify/Bench/test harness sessions —
    * a missing conf fails loudly with PARQUET_TYPE_ILLEGAL here); the raw
    * nanos long is floor-divided to micros — the same truncation DuckDB
    * applies when it casts the column to TIMESTAMP, so oracle comparisons
    * line up. Derived layouts (e.g. the MakeHeavy tier) store `ts` as a
    * plain micros TIMESTAMP already and pass through untouched.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
