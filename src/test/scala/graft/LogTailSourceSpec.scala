package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.operators.{Etl, Lakehouse, TableLog}
import graft.sources.LogTailSource

/** R18: the table log as a Structured Streaming SOURCE — offsets are log
  * versions, each window's added files stream as one micro-batch, and
  * the append-only contract refuses retractions loudly. */
class LogTailSourceSpec extends SparkSpecBase {

  private def fs(table: String) = new Path(table)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val fmt = classOf[LogTailSource].getName

  test("each commit streams as a micro-batch; marker-only commits are empty; Spark's checkpoint resumes past consumed versions") {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/logtail_table"
    val ckpt = s"${Etl.scratch(spark)}/logtail_ckpt"
    Seq(table, ckpt).foreach(t => fs(t).delete(new Path(t), true))
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    TableLog.commit(spark, table, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stage(spark, table, ev.filter($"event_id" % 3 === 0), "data/v1"))
    // foreachBatch sink: checkpoint-recoverable (the memory sink is not),
    // and it records (n, id_sum) per delivered batch so the restart arm
    // can assert EXACTLY which rows replayed
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def sink(buf: scala.collection.mutable.ArrayBuffer[(Long, Long)])(
        df: org.apache.spark.sql.DataFrame, bid: Long): Unit = {
      val r = df.agg(count(lit(1)), sum($"event_id")).collect().head
      if (r.getLong(0) > 0) buf.synchronized {
        buf += ((r.getLong(0), r.getLong(1)))
      }
    }
    val q = spark.readStream.format(fmt).load(table)
      .writeStream.foreachBatch(sink(seen) _)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      val w1 = ev.filter($"event_id" % 3 === 0)
        .agg(count(lit(1)), sum($"event_id")).collect().head
      assert(seen.toSeq === Seq((w1.getLong(0), w1.getLong(1))))
      // a second commit arrives as its own batch
      TableLog.commit(spark, table,
        TableLog.stage(spark, table, ev.filter($"event_id" % 3 === 1), "data/v2"))
      // a marker-only commit (txn) advances the offset with no rows
      TableLog.commitIfAbsent(spark, table, "other-writer", 7L, Nil)
      q.processAllAvailable()
      val w2 = ev.filter($"event_id" % 3 === 1)
        .agg(count(lit(1)), sum($"event_id")).collect().head
      assert(seen.toSeq ===
        Seq((w1.getLong(0), w1.getLong(1)), (w2.getLong(0), w2.getLong(1))))
    } finally q.stop()
    // restart AGAINST THE SAME CHECKPOINT: only versions past the stored
    // offset replay — the restarted query delivers just the new commit
    TableLog.commit(spark, table,
      TableLog.stage(spark, table, ev.filter($"event_id" % 3 === 2), "data/v4"))
    val seen2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q2 = spark.readStream.format(fmt).load(table)
      .writeStream.foreachBatch(sink(seen2) _)
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q2.processAllAvailable()
      val w3 = ev.filter($"event_id" % 3 === 2)
        .agg(count(lit(1)), sum($"event_id")).collect().head
      assert(seen2.toSeq === Seq((w3.getLong(0), w3.getLong(1))))
    } finally q2.stop()
    // planning never lists the data dir: a stray uncommitted file is
    // invisible to the tail (the S11 read rule)
    ev.limit(5).write.mode("overwrite").parquet(s"$table/data/stray")
    val q3 = spark.readStream.format(fmt).load(table)
      .writeStream.format("memory").queryName("logtail3").start()
    try {
      q3.processAllAvailable()
      assert(spark.table("logtail3").count() === ev.count())
    } finally q3.stop()
  }

  test("the append-only contract: a remove (OPTIMIZE) or a deletion vector in the tail fails the stream loudly") {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/logtail_ro_table"
    fs(table).delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    TableLog.commit(spark, table, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stageWithStats(spark, table, ev, "data/v1", Seq("event_id"), 4))
    val q = spark.readStream.format(fmt).load(table)
      .writeStream.format("memory").queryName("logtail_ro").start()
    try {
      q.processAllAvailable()
      assert(spark.table("logtail_ro").count() === ev.count())
      Lakehouse.compactCommit(spark, table, 2)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(e.getMessage.contains("APPEND-ONLY") ||
        Option(e.getCause).exists(_.getMessage.contains("APPEND-ONLY")))
    } finally q.stop()
    // a DV commit refuses the same way on a fresh tail from offset 0
    val table2 = s"${Etl.scratch(spark)}/logtail_dv_table"
    fs(table2).delete(new Path(table2), true)
    TableLog.commit(spark, table2, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stage(spark, table2, ev, "data/v1"))
    Lakehouse.morDelete(spark, table2,
      ev.filter($"event_type" === "click" && $"value" < 100.0)
        .select($"event_id"))
    val q2 = spark.readStream.format(fmt).load(table2)
      .writeStream.format("memory").queryName("logtail_dv").start()
    try {
      val e2 = intercept[StreamingQueryException] { q2.processAllAvailable() }
      assert(e2.getMessage.contains("deletion vector") ||
        Option(e2.getCause).exists(_.getMessage.contains("deletion vector")))
    } finally q2.stop()
  }

  test("startingVersion skips history a fresh tail cannot or should not replay — 'latest' tails only new commits past a compaction") {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/logtail_sv_table"
    fs(table).delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    TableLog.commit(spark, table, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stage(spark, table, ev.filter($"event_id" % 2 === 0), "data/v1"))
    TableLog.commit(spark, table,
      TableLog.stage(spark, table, ev.filter($"event_id" % 2 === 1), "data/v2"))
    // a compaction in the history: a full-history tail would refuse it
    Lakehouse.compactCommit(spark, table, 2)
    val q = spark.readStream.format(fmt)
      .option("startingVersion", "latest")
      .load(table)
      .writeStream.format("memory").queryName("logtail_sv").start()
    try {
      q.processAllAvailable()
      assert(spark.table("logtail_sv").count() === 0L)
      // only commits PAST query start stream
      val late = ev.filter($"event_type" === "signup").limit(25)
        .withColumn("event_id", $"event_id" + 90000000L)
        .localCheckpoint()
      TableLog.commit(spark, table, TableLog.stage(spark, table, late, "data/v4"))
      q.processAllAvailable()
      assert(spark.table("logtail_sv").count() === 25L)
      assert(spark.table("logtail_sv")
        .filter($"event_id" < 90000000L).count() === 0L)
    } finally q.stop()
    // a numeric startingVersion replays exactly the versions past it
    val q2 = spark.readStream.format(fmt)
      .option("startingVersion", "3")
      .load(table)
      .writeStream.format("memory").queryName("logtail_sv2").start()
    try {
      q2.processAllAvailable()
      assert(spark.table("logtail_sv2").count() === 25L)
    } finally q2.stop()
  }

  test("startingVersion=snapshot: the first batch is the CURRENT live state (no history replay), then the tail continues; live DVs refuse") {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/logtail_snap_table"
    fs(table).delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    TableLog.commit(spark, table, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stage(spark, table, ev.filter($"event_id" % 2 === 0), "data/v1"))
    TableLog.commit(spark, table,
      TableLog.stage(spark, table, ev.filter($"event_id" % 2 === 1), "data/v2"))
    // a compaction in the history: a full-history tail refuses it, the
    // snapshot start reads THROUGH it (the packed live state)
    Lakehouse.compactCommit(spark, table, 2)
    val q = spark.readStream.format(fmt)
      .option("startingVersion", "snapshot")
      .load(table)
      .writeStream.format("memory").queryName("logtail_snap").start()
    try {
      q.processAllAvailable()
      val want = ev.agg(count(lit(1)), sum($"event_id")).collect().head
      assert(spark.table("logtail_snap")
        .agg(count(lit(1)), sum($"event_id")).collect().head === want,
        "the snapshot batch must equal the current live state")
      // and the tail continues past the snapshot base
      val late = ev.filter($"event_type" === "error").limit(10)
        .withColumn("event_id", $"event_id" + 70000000L)
        .localCheckpoint()
      TableLog.commit(spark, table, TableLog.stage(spark, table, late, "data/v4"))
      q.processAllAvailable()
      assert(spark.table("logtail_snap").count() === want.getLong(0) + 10L)
    } finally q.stop()
    // a snapshot over live deletion vectors refuses loudly (this reader
    // cannot anti-join them — OPTIMIZE absorbs first)
    Lakehouse.morDelete(spark, table,
      ev.filter($"event_type" === "click" && $"value" < 100.0)
        .select($"event_id"))
    val q2 = spark.readStream.format(fmt)
      .option("startingVersion", "snapshot")
      .load(table)
      .writeStream.format("memory").queryName("logtail_snap2").start()
    try {
      val e = intercept[StreamingQueryException] { q2.processAllAvailable() }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("deletion vector"))
    } finally q2.stop()
  }

  test("an undecodable column type refuses at stream construction, naming the column") {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/logtail_ts_table"
    fs(table).delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"ts", $"event_type") // timestamp: unsupported
    TableLog.commit(spark, table, TableLog.Action("schema", ev.schema.json) +:
      TableLog.stage(spark, table, ev.limit(10), "data/v1"))
    val q = spark.readStream.format(fmt).load(table)
      .writeStream.format("memory").queryName("logtail_ts").start()
    try {
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      val msg = e.getMessage +
        Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("'ts'"), s"refusal must name the column; got: $msg")
    } finally q.stop()
  }
}
