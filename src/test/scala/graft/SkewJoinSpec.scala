package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a hot join key must be split across tasks at
  * runtime. Thresholds are lowered so the toy data triggers the same
  * OptimizeSkewedJoin path a production hot key would. */
class SkewJoinSpec extends SparkSpecBase {

  test("AQE splits a skewed join partition (OptimizeSkewedJoin fires)") {
    import spark.implicits._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (0) with 200k rows, 99 uniform keys with 200 each
      val skewed = spark.range(200000).select(lit(0L).as("k"), $"id".as("payload"))
        .union(spark.range(19800).select(($"id" % 99 + 1).as("k"), $"id".as("payload")))
      val dim = spark.range(100).select($"id".as("k"), concat(lit("v"), $"id").as("name"))
      val joined = skewed.join(dim, "k").groupBy($"name").agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum === 219800)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"))
      // the join is re-planned as skew-handled and the hot side's shuffle
      // read is split ("AQEShuffleRead coalesced and skewed")
      assert(p.contains("skew=true"), s"expected a skew-handled join in:\n$p")
      assert(p.contains("and skewed"), s"expected a skewed shuffle read in:\n$p")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
