package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The co-located star layout as a FIRST-CLASS operator: orders and
  * lineitem maintained as catalog tables bucketed (and sorted) on the
  * order key, so every orders⋈lineitem query runs its fact join AND its
  * post-join aggregation with ZERO shuffle exchanges. This is the
  * declared form of what CROSSOVER.md measured from the bench tier:
  * the plain q2/q3 pay a growing fact-table exchange per query (12–25s
  * and unstable at sf50) while the bucketed layout amortizes ONE
  * layout-time shuffle across every subsequent join — at 100 TB the
  * standard posture for repeatedly-joined fact tables. Results are
  * layout-independent (the oracle SQL is exactly q2/q3's), so
  * correctness never depends on the bucketing — only cost does.
  *
  * Build/serve split follows the AnnIndex idiom: the layout is built
  * once per (scratch, fixture) into external bucketed tables, stamped
  * with the source files' fingerprint, and rebuilt only when the source
  * bytes change; a fresh JVM re-registers the existing files instead of
  * rewriting them (bucket metadata lives in the catalog DDL, the bytes
  * on disk). */
object Bucketed {

  /** One bucket per local core; production sizes this to cluster
    * parallelism — bucketed scans parallelize at bucket granularity. */
  val BUCKETS = 32

  private def layoutRoot(spark: SparkSession): String =
    s"${Etl.scratch(spark)}/bucketed"

  /** Catalog-safe suffix per fixture dir, so sf0.001/sf0.01/sf0.1 tables
    * coexist in one session. */
  private def key(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "").toLowerCase

  /** Fingerprint of a source table's parquet bytes (name=len:mtime per
    * file) — same freshness contract as AnnIndex.sourceFingerprint. */
  private def fingerprint(sfDir: String, table: String): String = {
    val src = new File(s"$sfDir/$table.parquet")
    if (src.isFile) s"${src.getName}=${src.length}:${src.lastModified}"
    else Option(src.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isFile && !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => s"${f.getName}=${f.length}:${f.lastModified}")
      .mkString(";")
  }

  private def fresh(loc: String, fp: String): Boolean =
    new File(s"$loc/_SUCCESS").exists() &&
      Files.isRegularFile(Paths.get(s"$loc/_GRAFT_SOURCE")) &&
      new String(Files.readAllBytes(Paths.get(s"$loc/_GRAFT_SOURCE")),
        StandardCharsets.UTF_8) == fp

  /** Ensure one bucketed catalog table over `sfDir/<table>.parquet`,
    * bucket+sort key `bucketKey`. Returns the catalog table name. */
  private def ensure(spark: SparkSession, sfDir: String, table: String,
      bucketKey: String): String = {
    val name = s"graft_${table}_b_${key(sfDir)}"
    val loc = s"${layoutRoot(spark)}/$name"
    val fp = fingerprint(sfDir, table)
    if (!fresh(loc, fp)) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      Tables.sink(loc) {
        Tables.table(spark, sfDir, table)
          .write.bucketBy(BUCKETS, bucketKey).sortBy(bucketKey)
          .option("path", loc).mode("overwrite").saveAsTable(name)
      }
      Files.write(Paths.get(s"$loc/_GRAFT_SOURCE"),
        fp.getBytes(StandardCharsets.UTF_8))
    } else if (!spark.catalog.tableExists(name)) {
      // fresh bytes from an earlier JVM: re-register the DDL over them
      val ddl = spark.read.parquet(loc).schema.toDDL
      spark.sql(
        s"""CREATE TABLE $name ($ddl) USING PARQUET
           |CLUSTERED BY ($bucketKey) SORTED BY ($bucketKey) INTO $BUCKETS BUCKETS
           |LOCATION '$loc'""".stripMargin)
    }
    name
  }

  /** Ensure the bucketed fact pair; returns (orders, lineitem) frames.
    * The merge hint keeps AQE from broadcasting at toy scale — production
    * bucket use is exactly the case where both sides are too big for
    * that, and the hint is what lets the sf0.01 oracle run exercise the
    * same zero-exchange sort-merge plan the 100 TB deployment would. */
  def starFacts(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val orders = ensure(spark, sfDir, "orders", "o_orderkey")
    val lineitem = ensure(spark, sfDir, "lineitem", "l_orderkey")
    (spark.table(orders), spark.table(lineitem).hint("merge"))
  }

  /** Q2 [EXT variant] on the maintained bucketed layout — same result,
    * same oracle SQL as q2_shipping_priority; the fact join and its
    * aggregation run with zero exchanges (PlanAuditSpec pins it). */
  def q2Bucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val (orders, lineitem) = starFacts(spark, sfDir)
    Analytics.q2From(spark, Tables.customer(spark, sfDir), orders, lineitem)
  }

  /** Q3 [EXT variant] on the maintained bucketed layout (see [[q2Bucketed]]). */
  def q3Bucketed(spark: SparkSession, sfDir: String): DataFrame = {
    val (orders, lineitem) = starFacts(spark, sfDir)
    Analytics.q3From(spark, Tables.region(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.customer(spark, sfDir),
      orders, lineitem)
  }
}
