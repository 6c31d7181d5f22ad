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

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
