package graft.tools

import graft.operators.TableLog

/** Measure what the S19 checkpoint buys on a LONG log: metadata replay
  * cost per read before vs after `checkpointLog`. The table is synthetic
  * manifests only (replay never opens data files, so the probe isolates
  * exactly the term the checkpoint collapses): N commits of one add
  * action each, txn-marked every 4th — the shape of a micro-batch ingest
  * that ran for months. Times (lower-median of REPS):
  *  - liveState(head): every snapshot read's planning term,
  *  - alreadyCommitted(miss): the exactly-once probe every micro-batch
  *    pays BEFORE committing (a miss scans everything — the worst case),
  *  - schemaAsOf(head): the backward scan.
  * One JSON line to stdout and target/log_replay_probe_<n>.json.
  */
object LogReplayProbe {
  val REPS = 5

  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = MakeHeavy.session()
    val table = s"target/graft-tmp/log_replay_probe_$commits"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(table), true)

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType)))
    (1 to commits).foreach { v =>
      val adds = Seq(TableLog.Action("add", s"data/b$v/part-0.parquet",
        Seq(TableLog.FileStats("event_id", v.toLong * 100, v.toLong * 100 + 99))))
      val acts =
        if (v == 1) TableLog.Action("schema", schema.json) +: adds
        else if (v % 4 == 0)
          adds :+ TableLog.Action("txn", s"ingest\t${v / 4}")
        else adds
      TableLog.publish(spark, table, v, acts)
    }

    def med(f: => Unit): Double =
      graft.BenchUtil.median((1 to REPS).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.toVector)
    def arms(): Seq[(String, Double)] = Seq(
      "liveState" -> med {
        require(TableLog.liveState(spark, table, commits).files.size == commits)
      },
      "txnProbeMiss" -> med {
        require(!TableLog.alreadyCommitted(spark, table, "ingest", 999999L))
      },
      "schemaAsOf" -> med {
        require(TableLog.schemaAsOf(spark, table, commits).isDefined)
      })

    val before = arms()
    TableLog.checkpointLog(spark, table)
    val after = arms()
    val line = "{" + (
      before.map { case (n, w) => s""""${n}_full":$w""" } ++
        after.map { case (n, w) => s""""${n}_ckpt":$w""" } ++
        Seq(s""""commits":$commits""")).mkString(",") + "}"
    println(line)
    graft.BenchUtil.writeArtifact(s"target/log_replay_probe_$commits.json", line)
    spark.stop()
  }
}
