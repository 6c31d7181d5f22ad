package graft

import org.apache.spark.sql.functions._

/** AQE skew handling: a hot join key must be split across tasks at
  * runtime. Thresholds are lowered so the toy data triggers the same
  * OptimizeSkewedJoin path a production hot key would. */
class SkewJoinSpec extends SparkSpecBase {

  test("j7: salted join equals the plain join; both salt branches fire") {
    import spark.implicits._
    val got = graft.operators.Joins.j7SkewJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val e = graft.Tables.events(spark, sfDir)
      .select($"event_id", $"user_id")
    val c = graft.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_name", $"c_mktsegment")
    val plain = e.join(c, $"user_id" === $"c_custkey", "left_outer")
      .select($"event_id", $"user_id",
        coalesce($"c_name", lit("Unknown")).as("name"), $"c_mktsegment")
      .orderBy($"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got === plain)
    // the hot/cold split is real on this fixture: the exact integer
    // threshold (load >= 9/8 mean) flags at least one key, and a fact
    // row only draws salt > 0 on the hot path
    val hist = e.groupBy($"user_id").agg(count(lit(1)).as("k_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = hist.map(_._2).sum
    val hot = hist.filter { case (_, n) => n * hist.length * 8 >= total * 9 }
    assert(hot.nonEmpty && hot.length < hist.length,
      s"fixture must have hot AND cold keys: ${hot.length}/${hist.length}")
  }

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
