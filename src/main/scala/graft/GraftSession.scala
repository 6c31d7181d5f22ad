package graft

import org.apache.spark.sql.SparkSession

/** Production session factory: the configuration this library is designed
  * to run under on a real cluster. The driver harnesses (Verify/Bench)
  * build their own minimal sessions; this is the deployment surface for
  * library users, and the single place the 100 TB tuning knobs live.
  */
object GraftSession {

  /** The tuning knobs, as data so tests can validate every key/value
    * against a live session (a typo'd conf key would otherwise be
    * silently ignored at builder time). Rationale (README / SURVEY §4):
    *  - AQE on (with skew-join handling): runtime re-plan picks broadcast
    *    joins from real sizes and splits skewed shuffle partitions —
    *    together with the salting pattern (operators.Analytics.a7SaltedAgg)
    *    this covers both planned and emergent skew;
    *  - shuffle partitions sized ~2-3x total executor cores, then left to
    *    AQE coalescing — at 1000 executors x 4 cores set ~8192, never the
    *    default 200;
    *  - 128 MB scan splits keep scan tasks IO-bound, not scheduler-bound;
    *  - UTC session time: all graft semantics are timezone-pinned
    *    (SURVEY §4.3 determinism).
    */
  def tunedConf(shufflePartitions: Int): Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    "spark.sql.session.timeZone" -> "UTC",
    // the events fixture stores TIMESTAMP(NANOS), which Spark's micros
    // TimestampType rejects; read nanos as raw longs (Tables.events then
    // floor-divides to micros). Session-level so no loader mutates conf.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
  )

  /** Static conf that must be present at session build time. */
  val extensionsConf: (String, String) =
    "spark.sql.extensions" -> classOf[graft.plans.GraftExtensions].getName

  /** Apply graft's recommended SQL conf to any builder. */
  def tuned(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = {
    val withRuntime = tunedConf(shufflePartitions)
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
    withRuntime.config(extensionsConf._1, extensionsConf._2)
  }

  /** Local development/test session (local[n], n shuffle partitions). */
  def local(cores: Int): SparkSession = {
    val s = tuned(SparkSession.builder().master(s"local[$cores]"), cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
