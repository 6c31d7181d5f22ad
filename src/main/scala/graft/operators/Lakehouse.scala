package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TableLog.Action

/** S13–S15 [EXT]: the production table-format layer composed from
  * [[TableLog]]'s primitives — the three capabilities the r15 review named
  * as the gap between "transactional log + standalone compaction" and a
  * table format a 100 TB deployment runs:
  *
  *  - S13 log-committed compaction: OPTIMIZE as ONE manifest transaction
  *    (remove the fragmented inputs + add the bin-packed outputs in a
  *    single commit), so readers keep snapshot isolation while compaction
  *    runs — no reliance on directory-rename atomicity, which object
  *    stores (the reference's storage class, minio.rs:139-242) do not
  *    have. Conflict semantics are the production ones: blind appends
  *    racing the compaction cost it a clean retry; a concurrent commit
  *    that removed one of its input files is a REAL conflict and aborts.
  *  - S14 change-data-feed read: per-version row-level deltas derived
  *    from the log's add/remove file actions — insert / delete / update
  *    classified by a key join of each commit window's removed rows
  *    against its added rows, with rewritten-but-identical rows emitting
  *    NOTHING (so an S13 compaction produces an EMPTY feed, the property
  *    that lets non-abelian consumers subscribe without storms).
  *  - S15 manifest-stats file skipping: `add` actions carry per-file
  *    min/max of a cluster column ([[TableLog.stageWithStats]]) and a
  *    range read prunes the snapshot's file list from the MANIFEST before
  *    opening any parquet footer ([[TableLog.readAsOfRange]]).
  */
object Lakehouse {

  /** S13 [EXT]: OPTIMIZE as a log transaction. Reads the current
    * snapshot, stages it bin-packed into `targetFiles` files (with
    * manifest stats on `statsCol` when given, so compaction PRESERVES
    * S15's pruning instead of erasing it), then publishes
    * `remove(all inputs) + add(packed outputs)` as ONE commit.
    *
    * Concurrency is optimistic via the version CAS ([[TableLog.publish]]'s
    * one-winner contract) with compaction's read-modify-write conflict
    * rule layered on top:
    *  - whenever the head moved past the snapshot version (a lost publish
    *    race, or a commit that landed between snapshot and first publish),
    *    the input set is revalidated against the new head's live set;
    *  - inputs all still live (the interloper was a blind append) → retry
    *    at the new version with the SAME staged actions: the append's
    *    files are not in the remove set, so they stay live alongside the
    *    packed rewrite — nothing is lost, nothing re-staged;
    *  - any input no longer live (a concurrent compaction or delete won)
    *    → ConcurrentModificationException: committing would re-add rows
    *    whose files another writer already rewrote (double compaction).
    *    The aborted attempt's staged files are orphans, [[TableLog.vacuum]]'s
    *    job. This is why [[TableLog.commitWithRetry]] keeps blind retry
    *    opt-in: compaction does NOT commute with file removal.
    *
    * Readers pinned at any version ≤ the snapshot see identical rows
    * throughout: removed files stay on disk until vacuum, and the swap is
    * one manifest publish, never a directory mutation. */
  private[graft] def compactCommit(spark: SparkSession, table: String,
      targetFiles: Int, statsCols: Seq[String] = Nil, maxAttempts: Int = 5,
      beforePublish: Int => Unit = _ => ()): Int = {
    val v0 = TableLog.currentVersion(spark, table)
    val st0 = TableLog.liveState(spark, table, v0)
    val inputs = st0.files.map(_.path)
    val dvInputs = st0.dvs.map(_._1)
    require(inputs.nonEmpty, s"nothing to compact in $table")
    val rel = s"data/compact/${java.util.UUID.randomUUID}"
    // the snapshot read is DV-aware, so the packed rewrite ABSORBS every
    // live deletion vector (S18): deleted rows are physically gone from
    // the output and the DVs retire in the same commit — the OPTIMIZE
    // step that bounds how many DVs a read ever has to anti-join
    val snapshot = TableLog.readAsOf(spark, table, v0)
    val adds =
      if (statsCols.nonEmpty)
        TableLog.stageWithStats(spark, table, snapshot, rel, statsCols, targetFiles)
      else TableLog.stage(spark, table, snapshot.repartition(targetFiles), rel)
    val actions = (inputs ++ dvInputs).map(Action("remove", _)) ++ adds
    var attempt = 1
    while (true) {
      val head = TableLog.currentVersion(spark, table)
      if (head != v0) {
        val now = TableLog.liveState(spark, table, head)
        val nowLive = now.files.map(_.path).toSet ++ now.dvs.map(_._1).toSet
        val gone = (inputs ++ dvInputs).filterNot(nowLive)
        if (gone.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"compaction conflict: ${gone.size} input file(s) removed by a " +
              s"concurrent commit since v$v0 (e.g. ${gone.head}); " +
              "staged rewrite abandoned for vacuum")
        // a deletion vector that landed since the snapshot is ALSO a real
        // conflict: it scopes to files added before it, and the packed
        // rewrite (added at head+1) would escape it — committing would
        // resurrect the concurrently deleted rows
        val newDvs = now.dvs.map(_._1).filterNot(dvInputs.toSet)
        if (newDvs.nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"compaction conflict: ${newDvs.size} deletion vector(s) " +
              s"committed since v$v0 (e.g. ${newDvs.head}) would not apply " +
              "to the packed rewrite; staged rewrite abandoned for vacuum")
      }
      beforePublish(head + 1)
      try return TableLog.publish(spark, table, head + 1, actions)
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.contains("lost the publish race") =>
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"compaction still losing the publish race after $maxAttempts attempts", e)
          attempt += 1
      }
    }
    -1 // unreachable
  }

  /** Auto-maintenance policy (S13 as a POLICY, conf-gated): OPTIMIZE
    * when the snapshot's METADATA says the read tax passed the knobs —
    * `spark.graft.log.optimizeMaxDvs` live deletion vectors (each stacks
    * a broadcast anti-join on every read; LakeMergeProbe prices the tax)
    * or `spark.graft.log.optimizeMaxFiles` live files (the per-file scan
    * floor), packing to `spark.graft.log.optimizeTargetFiles`. The check
    * is metadata-only — one log replay, no data I/O — and both knobs
    * default to 0 = off, so callers that schedule their own maintenance
    * see no change. This is what turns the S13×S18/S20 contract
    * ("compaction absorbs DVs, which bounds their accumulation") from a
    * manual promise into an invariant a long-lived writer actually
    * keeps. A concurrent-commit conflict surfaces loudly like any
    * compaction (S13's discipline) — schedulers just retry next tick.
    * Returns the OPTIMIZE's committed version, or None (below
    * thresholds, or policy off). */
  def maybeOptimize(spark: SparkSession, table: String,
      statsCols: Seq[String] = Nil): Option[Int] = {
    val maxDvs = TableLog.confInt(spark, "spark.graft.log.optimizeMaxDvs", "0")
    val maxFiles = TableLog.confInt(spark, "spark.graft.log.optimizeMaxFiles", "0")
    if (maxDvs <= 0 && maxFiles <= 0) return None
    val target = TableLog.confInt(spark, "spark.graft.log.optimizeTargetFiles", "4")
    val cur = TableLog.currentVersion(spark, table)
    if (cur == 0) return None
    val st = TableLog.liveState(spark, table, cur)
    if ((maxDvs > 0 && st.dvs.size >= maxDvs) ||
        (maxFiles > 0 && st.files.size >= maxFiles))
      Some(compactCommit(spark, table, target, statsCols))
    else None
  }

  /** s13's fixture: eight micro-batch commits (event_id mod 8 — the
    * r15/l2g synthetic-feed convention), each fragmented into exactly 4
    * files the way a files-per-trigger streaming sink appends — 32 small
    * live files by v8, the layout OPTIMIZE exists for. */
  private[graft] val S13_BATCHES = 8
  private[graft] val S13_FILES_PER_BATCH = 4
  private[graft] val S13_TARGET_FILES = 2

  private[graft] def s13Fixture(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    import spark.implicits._
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // the eight micro-batch file sets stage concurrently (TableLog
    // .inParallel — disjoint dirs, invisible until committed); only the
    // eight manifest publishes stay ordered. The COMMIT SEQUENCE readers
    // observe is identical; the wall drops from eight serial write jobs
    // (per-job floor each) to ~two pool rounds.
    val staged = TableLog.inParallel((0 until S13_BATCHES).map(b => () =>
      TableLog.stage(spark, table,
        ev.filter($"event_id" % S13_BATCHES === b).repartition(S13_FILES_PER_BATCH),
        s"data/b$b")))
    staged.zipWithIndex.foreach { case (adds, b) =>
      TableLog.commit(spark, table,
        if (b == 0) Action("schema", ev.schema.json) +: adds else adds)
    }
  }

  /** S13 [EXT]: declared query — build the fragmented eight-commit table,
    * OPTIMIZE it as one manifest transaction, and audit the pre- and
    * post-compaction snapshots as (version, n_rows, id_sum, n_files).
    * Data identity across the compaction commit is the oracle's row/hash
    * check (v8 ≡ v9 ≡ the full source table); the manifest file-count
    * collapse (32 → 2) rides IN the row — both counts are deterministic
    * (round-robin repartition leaves no partition empty at any declared
    * sf), so the oracle states them as literals. LakehouseSpec drives
    * what SQL can't see: the pinned-reader race, the append retry, and
    * the real-conflict abort. */
  def s13LogCompaction(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s13_table"
    s13Fixture(spark, sfDir, table)
    val vPre = TableLog.currentVersion(spark, table)
    val vPost = compactCommit(spark, table, S13_TARGET_FILES)
    def audit(v: Int): DataFrame = {
      val nFiles = TableLog.liveFiles(spark, table, v).size.toLong
      TableLog.readAsOf(spark, table, v)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"id_sum",
          lit(nFiles).as("n_files"))
    }
    audit(vPre).unionByName(audit(vPost)).orderBy($"version")
  }

  // ------------------------------------------------------------- S14: CDF

  /** Row-level change feed for ONE commit: the net delta of version `v`
    * derived from its add/remove file actions. The removed files' rows
    * (pre-images) full-outer-join the added files' rows (post-images) on
    * `keyCol`; a key only in the adds is an `insert`, only in the removes
    * a `delete`, in both with ANY differing common column an `update`
    * (post-image emitted), and in both with identical values NOTHING —
    * a pure rewrite (compaction, clustering) produces an empty feed,
    * which is what makes the feed subscribable: a downstream consumer
    * never sees a layout change as a data storm.
    *
    * Scale shape: the join is bounded by the COMMIT WINDOW's files, never
    * the table — a daily commit touching 0.01% of a 100 TB table feeds
    * consumers at 0.01% cost, the same argument as MV1's delta refresh.
    * Rows are read under the LOGGED schemas (post-images at v, pre-images
    * at v-1 — the readAsOf discipline), compared on their COMMON columns;
    * `keyCol` must be unique per snapshot (the fixture's event_id), the
    * same contract every CDF-producing table format states. */
  /** One-commit slice against an ALREADY-REPLAYED pre-state: the caller
    * supplies v-1's live files/DVs/schema and manifest v's actions, so a
    * window read pays ONE pass over the log ([[cdfRead]] threads it)
    * instead of a fresh prefix replay per slice. */
  private def cdfSliceFrom(spark: SparkSession, table: String, v: Int,
      keyCol: String, preState: TableLog.LiveState,
      preSchemaOpt: Option[org.apache.spark.sql.types.StructType],
      postSchemaOpt: Option[org.apache.spark.sql.types.StructType],
      actions: Seq[Action]): DataFrame = {
    val postSchema = postSchemaOpt.getOrElse(
      throw new IllegalStateException(
        s"cdfRead needs a logged schema for $table@v$v — commit one at v1"))
    val preSchema = if (v == 1) postSchema else preSchemaOpt.getOrElse(postSchema)
    // dv paths are NOT data files: a remove that retires a DV (an
    // absorbing compaction) must not read the key file as pre-images
    val dvPaths = actions.collect { case Action("dv", p, _) => p }
    val dvEver = preState.dvs.map(_._1).toSet ++ dvPaths
    val adds = actions.collect { case Action("add", p, _) => p }
    val removes = actions.collect {
      case Action("remove", p, _) if !dvEver(p) => p }
    // the empty arm is a LocalRelation (createDataFrame over an empty
    // LIST), not an empty RDD: a LogicalRDD has no stats, so the
    // optimizer cannot prove it empty and its union branch survives into
    // the physical plan as a real scan node — PropagateEmptyRelation
    // erases the LocalRelation form, keeping the no-DV/no-remove slices'
    // plans identical to the pre-S20 shape (the r17 bench drift gate
    // caught exactly this: s14's scan count grew 6 -> 8)
    def rd(files: Seq[String], schema: org.apache.spark.sql.types.StructType) =
      if (files.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
      else spark.read.schema(schema).parquet(files.map(r => s"$table/$r"): _*)
    val valCols = postSchema.fieldNames.toSeq
      .intersect(preSchema.fieldNames.toSeq).filterNot(_ == keyCol)
    require(valCols.nonEmpty,
      s"cdfRead needs at least one non-key column shared by v${v - 1}/v$v schemas")
    // pre-images are the removed files' rows AS VISIBLE at v-1 — with the
    // deletion vectors live at v-1 applied (S18). A raw read would feed a
    // DV-absorbing compaction's physical purge as a SECOND delete of rows
    // every consumer already saw deleted.
    val removedSet = removes.toSet
    val preFiles = preState.files.filter(f => removedSet(f.path))
    val preFromRemoves =
      if (preFiles.isEmpty) rd(Nil, preSchema)
      else TableLog.scanState(spark, table, preFiles, preState.dvs, Some(preSchema))
    // S18/S20: a deletion-vector action hides rows without touching a
    // data file, so its pre-images are invisible to the removed-file scan
    // above — derive them by semi-joining the v-1 snapshot (earlier DVs
    // already applied: a key deleted twice feeds once) against the new
    // DV keys, and fold them into the SAME full-outer join below. That is
    // what nets a MOR MERGE commit (dv + adds in one version, S20) to
    // `update` rows carrying post-images — not an insert/delete pair a
    // strict consumer could order wrong — while a pure DV delete (S18)
    // still nets to `delete` rows with pre-images. The DV side is
    // delete-volume-bounded and broadcasts. Files removed by THIS commit
    // are excluded from the semi-join scan: their visible rows already
    // feed through the removed-file side, and feeding them twice would
    // duplicate keys into the full-outer join.
    val preFromDvs =
      if (dvPaths.isEmpty) rd(Nil, preSchema)
      else {
        val snapFiles = preState.files.filterNot(f => removedSet(f.path))
        val preSnap =
          if (snapFiles.isEmpty) rd(Nil, preSchema)
          else TableLog.scanState(spark, table, snapFiles, preState.dvs,
            Some(preSchema))
        dvPaths.map(p => spark.read.parquet(s"$table/$p"))
          .groupBy(_.columns.head).toSeq
          .map { case (kc, frames) =>
            val keys = frames.map(_.select(col(kc).as("__dv_key"))).reduce(_ union _)
            preSnap.join(broadcast(keys), col(kc) === col("__dv_key"), "left_semi")
          }
          .reduce(_ unionByName _)
          .dropDuplicates(keyCol)
      }
    // columns only the POST schema has — the evolution commit itself,
    // where v-1's logged schema lacks them so they cannot ride the
    // compare structs. Their VALUES still ride the feed (post-images
    // carry the full post schema; delete rows null-fill them), and a
    // rewritten row whose only change is a NON-NULL value in a new
    // column classifies as an update — the row genuinely gained data, a
    // feed that dropped it would silently diverge every downstream
    // replica. Identical rewrites that leave the new column null still
    // feed NOTHING (a bare evolution commit or a compaction after one is
    // not a data storm). One commit later the column is in both schemas
    // and takes the ordinary compare path.
    val postOnly = postSchema.fieldNames.toSeq
      .diff(preSchema.fieldNames.toSeq).filterNot(_ == keyCol)
    val pre = preFromRemoves.unionByName(preFromDvs)
      .select(col(keyCol).as("__key"), struct(valCols.map(col): _*).as("__pre"))
    val post = rd(adds, postSchema)
      .select(Seq(col(keyCol).as("__key"),
        struct(valCols.map(col): _*).as("__post")) ++
        (if (postOnly.isEmpty) Nil
         else Seq(struct(postOnly.map(col): _*).as("__postx"))): _*)
    val postxChanged =
      if (postOnly.isEmpty) lit(false)
      else postOnly.map(c => col(s"__postx.$c").isNotNull).reduce(_ || _)
    val fileDelta = pre.join(post, Seq("__key"), "full_outer")
      .withColumn("_change_type",
        when(col("__pre").isNull, "insert")
          .when(col("__post").isNull, "delete")
          .when(!(col("__pre") <=> col("__post")) || postxChanged, "update"))
      .filter(col("_change_type").isNotNull)
      .withColumn("__img",
        when(col("__post").isNotNull, col("__post")).otherwise(col("__pre")))
      .select(Seq(lit(v.toLong).as("_commit_version"), col("_change_type"),
        col("__key").as(keyCol)) ++ valCols.map(c => col(s"__img.$c").as(c)) ++
        postOnly.map(c => col(s"__postx.$c").as(c)): _*)
    fileDelta
  }

  /** Single-commit wrapper (cdfApply's shape): one prefix replay for the
    * pre-state — bounded, since the caller processes one version. Window
    * readers go through [[cdfRead]], which replays the log ONCE. */
  private[graft] def cdfSlice(spark: SparkSession, table: String, v: Int,
      keyCol: String): DataFrame =
    cdfSliceFrom(spark, table, v, keyCol,
      TableLog.liveState(spark, table, v - 1),
      if (v == 1) None else TableLog.schemaAsOf(spark, table, v - 1),
      TableLog.schemaAsOf(spark, table, v),
      TableLog.manifestEntries(spark, table, v)._1)

  /** S14 [EXT]: change-data-feed read over the window (from, to] — the
    * union of each commit's [[cdfSlice]], the subscription surface MV1's
    * abelian delta cannot offer non-additive consumers (a downstream
    * MERGE, a cache invalidator, a search indexer). */
  def cdfRead(spark: SparkSession, table: String, from: Int, to: Int,
      keyCol: String): DataFrame = {
    require(from <= to, s"cdfRead window inverted: ($from, $to]")
    val cur = TableLog.currentVersion(spark, table)
    require(to <= cur, s"cdfRead past the head: to=$to but $table is at v$cur")
    if (from == to) {
      // the poller's steady state: no new commits → an EMPTY feed with
      // the feed's schema (derived from the logged table schema), never
      // an exception. Bounded to the head above, so schemaAsOf never
      // opens a manifest that does not exist; a table with NO commits
      // yet gets the loud schema message, not a FileNotFoundException.
      val schema = (if (cur >= 1)
        TableLog.schemaAsOf(spark, table, math.min(math.max(to, 1), cur))
      else None)
        .getOrElse(throw new IllegalStateException(
          s"cdfRead needs a logged schema for $table — commit one at v1"))
      val feed = org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("_commit_version",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("_change_type",
            org.apache.spark.sql.types.StringType, nullable = false),
          schema(keyCol)) ++
          schema.fields.filterNot(_.name == keyCol))
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), feed)
    }
    // ONE replay threaded across the window — O(window) manifest reads
    // past the base state (which itself starts from the newest log
    // checkpoint at or below `from`, S19): the live state and logged
    // schema advance commit by commit, and each slice consumes the
    // snapshot taken just before its own manifest applies.
    val base = TableLog.liveState(spark, table, from)
    val files = scala.collection.mutable.LinkedHashMap.empty[String, TableLog.LiveFile]
    base.files.foreach(f => files(f.path) = f)
    val dvs = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    base.dvs.foreach { case (p, v) => dvs(p) = v }
    var schema: Option[org.apache.spark.sql.types.StructType] =
      TableLog.schemaAsOf(spark, table, from)
    def advance(v: Int): Seq[Action] = {
      val (acts, sch) = TableLog.manifestEntries(spark, table, v)
      acts.foreach {
        case Action("add", p, st) => files(p) = TableLog.LiveFile(p, st, v)
        case Action("dv", p, _) => dvs(p) = v
        case Action("remove", p, _) => files.remove(p); dvs.remove(p)
        case _ => ()
      }
      sch.foreach(s => schema = Some(s))
      acts
    }
    // allowMissingColumns: slices on either side of a schema-evolution
    // commit (S12) carry different value-column sets — the pre-evolution
    // slices null-fill the later columns, so a CDF window MAY cross an
    // evolution boundary instead of throwing AnalysisException on the
    // union (each slice still compares pre/post images on the columns
    // both sides of ITS commit share — evolution never fabricates an
    // update out of a null-fill)
    ((from + 1) to to).map { v =>
      val preState = TableLog.LiveState(files.values.toSeq, dvs.toSeq)
      val preSchema = schema
      val acts = advance(v)
      cdfSliceFrom(spark, table, v, keyCol, preState, preSchema, schema, acts)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** s14's fixture: the s11 three-commit history plus a fourth commit
    * that rewrites the `error` partition with `value + 1` — a backfill
    * whose rows all genuinely CHANGE, so the feed must classify them as
    * updates (the v3 rewrite, by contrast, re-adds identical click rows,
    * which must classify as nothing). */
  private[graft] def s14Fixture(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    import spark.implicits._
    val bumped = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type",
        ($"value" + 1.0).as("value"))
      .filter($"event_type" === "error")
    // the v4 backfill's file set stages concurrently with the fixture's
    // nine (buildFixtureWith) — invisible until the v4 commit below, which
    // still computes its remove set from the ACTUAL v3 manifest
    val (_, extraAdds) = TableLog.buildFixtureWith(spark, sfDir, table,
      Seq("data/v4/error" -> bumped))
    val retired = TableLog.liveFiles(spark, table, 3).filter(_.contains("/error/"))
    TableLog.commit(spark, table,
      retired.map(Action("remove", _)) ++ extraAdds.head)
  }

  /** S14 [EXT]: declared query — the full feed of the four-commit fixture
    * rolled to (version, change_type, n_rows, id_sum). The oracle replays
    * the commit rules: v1/v2 are pure inserts (the mod-4 split), v3 must
    * emit ONLY the deletes (clicks under 100 — its re-added ≥100 rows are
    * identical and must vanish from the feed), v4 must emit every error
    * row exactly once as an update. A feed that leaks rewrites, misses a
    * remove, or double-counts diverges on rows or hash. */
  def s14CdfRead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s14_table"
    s14Fixture(spark, sfDir, table)
    cdfRead(spark, table, 0, 4, "event_id")
      .groupBy($"_commit_version".as("version"), $"_change_type".as("change_type"))
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"version", $"change_type")
  }

  // ------------------------------------- MV2: CDF-driven partial refresh

  /** MV2 [EXT]: incremental maintenance of a NON-ABELIAN view from the
    * change feed — the consumer S14 exists for. MV1's delta refresh only
    * works for aggregates that merge by addition (counts, sums): a MIN /
    * MAX / exact-distinct view cannot subtract a delete. The production
    * answer is PARTIAL recompute: the feed names exactly the groups a
    * commit window touched, so the refresh recomputes THOSE groups from
    * the snapshot and carries every untouched group forward from the
    * stored state without scanning a row of it.
    *
    * Cost shape at 100 TB: |touched groups| is bounded by the window's
    * change volume (CDF is window-bounded, the MV1 argument), the
    * recompute scan is filtered to the touched groups' rows (predicate
    * pushdown prunes row groups; a partition/cluster layout on the group
    * key prunes files), and the untouched state never moves. A daily
    * commit touching 2 of 10^6 groups refreshes a MIN view at the cost
    * of 2 groups, not a corpus rescan — which is the whole point of
    * keeping row-level deltas next to the log.
    *
    * `state` must be keyed by `groupCol` with the same schema as the
    * recompute's output; `keyCol` is the table's row key the change feed
    * joins on (cdfRead's contract). Returns the refreshed view. */
  private[graft] def mv2Refresh(spark: SparkSession, table: String,
      state: DataFrame, from: Int, to: Int, groupCol: String,
      keyCol: String = "event_id")(
      recompute: DataFrame => DataFrame): DataFrame = {
    // the touched-group keys stay DISTRIBUTED: a wide window at 100 TB can
    // name 10^4–10^6 groups, and materializing them as `isin` plan
    // literals (the first-cut plan) is an analyzer/codegen blowup and a
    // driver OOM vector. Instead the key frame rides both sides as a
    // broadcast join — semi for the recompute filter (with dynamic
    // partition/file pruning doing the isin literal's job against a
    // group-clustered layout), anti for the state carry-forward. The
    // checkpoint is because both joins consume the frame: without it each
    // side would re-run cdfRead's per-commit full-outer joins.
    val touched = cdfRead(spark, table, from, to, keyCol)
      .select(col(groupCol).as("__touched")).distinct().localCheckpoint()
    // null-SAFE equality on both joins: a nullable group column can have
    // NULL as a touched group, and plain === would neither recompute it
    // (semi join: null never matches) nor retire its state row (anti
    // join keeps non-matches) — serving a silently STALE null-group
    // aggregate. <=> recomputes it and retires the old row like any key.
    val fresh = recompute(
      TableLog.readAsOf(spark, table, to)
        .join(broadcast(touched), col(groupCol) <=> col("__touched"), "left_semi"))
    state.join(broadcast(touched), col(groupCol) <=> col("__touched"), "left_anti")
      .unionByName(fresh)
  }

  /** MV2 [EXT]: declared query — a per-type (n_rows, min_value) view (MIN
    * is non-abelian: a delete can RAISE it, which MV1's signed merge
    * cannot express) maintained across the s14 fixture's v3 delete commit
    * (clicks under 100 removed — min(click) must jump to the ≥100 floor)
    * and v4 update commit (error values +1 — min(error) must move) by
    * CDF-targeted partial recompute from the stored v2 state. The oracle
    * recomputes the v4 view directly from the commit rules; LakehouseSpec
    * pins what SQL can't see — untouched groups ride from the STATE
    * (a sentinel planted in an untouched group's state row survives the
    * refresh verbatim). */
  def mv2CdfRefresh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/mv2_table"
    s14Fixture(spark, sfDir, table)
    def view(df: DataFrame): DataFrame =
      df.groupBy($"event_type")
        .agg(count(lit(1)).as("n_rows"), min($"value").as("min_value"))
    val state = view(TableLog.readAsOf(spark, table, 2))
    mv2Refresh(spark, table, state, 2, 4, "event_type")(view)
      .orderBy($"event_type")
  }

  // --------------------------------------------- S15: manifest file skipping

  private[graft] val S15_LO = 100L
  private[graft] val S15_HI = 299L
  private[graft] val S15_V1_FILES = 8
  private[graft] val S15_V2_FILES = 4

  /** s15's fixture: two commits staged through [[TableLog.stageWithStats]]
    * — v1 clusters the mod-4≠3 slice on event_id into 8 range files, v2
    * appends the remainder as 4 more — so the manifest carries tight
    * per-file [min, max] and a range predicate keeps ~2 of 12 files. */
  private[graft] def s15Fixture(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    import spark.implicits._
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // both commits' clustered stage passes run concurrently (disjoint
    // dirs, invisible until the ordered commits) — each stageWithStats is
    // three tiny jobs (range sample, write, stats read-back) of mostly
    // per-job floor at this scale
    val Seq(v1Adds, v2Adds) = TableLog.inParallel(Seq(
      () => TableLog.stageWithStats(spark, table,
        ev.filter($"event_id" % 4 =!= 3), "data/v1", Seq("event_id"), S15_V1_FILES),
      () => TableLog.stageWithStats(spark, table,
        ev.filter($"event_id" % 4 === 3), "data/v2", Seq("event_id"), S15_V2_FILES)))
    TableLog.commit(spark, table, Action("schema", ev.schema.json) +: v1Adds)
    TableLog.commit(spark, table, v2Adds)
  }

  // ------------------------------- S17: pruned copy-on-write MERGE (CDF sync)

  /** Apply ONE commit's change feed to a downstream log table as a
    * pruned copy-on-write MERGE — the composition the whole r16 layer
    * builds toward: S14 names the changed rows, S15's manifest stats
    * bound which destination files can hold their keys, and the S11 txn
    * marker makes the apply EXACTLY-ONCE under re-delivery.
    *
    * Shape: destination files are staged clustered on `keyCol` with
    * manifest stats, so the rewrite set is `prunedLiveFiles(dst)` over
    * the delta's [min, max] key range — every other file is untouched
    * (not read, not rewritten, byte-identical on disk). The rewritten
    * rows are the pruned files' rows anti-joined against delete/update
    * keys, unioned with insert/update post-images; the commit removes
    * exactly the pruned files and adds the re-clustered replacements,
    * under a `(cdf:<consumer>, version)` txn marker — a re-delivered
    * version no-ops at the gate, the dst never applies a delta twice.
    *
    * At 100 TB: |rewrite| is bounded by the delta's key locality, not the
    * table — a commit touching one key range rewrites the files covering
    * that range (the copy-on-write MERGE every production format runs for
    * its UPDATE/DELETE/MERGE), and the key-clustered layout is what keeps
    * that bound tight. Returns the dst version committed (-1 = replayed
    * no-op). */
  /** A window delta materialized AHEAD of its apply: the checkpointed
    * slice plus the two source-side probe answers. A slice reads only the
    * SOURCE (fixed for the whole window once a tick starts), so an apply
    * loop prepares the next versions' deltas concurrently
    * ([[prepareDelta]] on [[TableLog.inParallel]]) and overlaps their
    * materialization jobs with the current version's stage+commit. */
  private[graft] final case class PreparedDelta(delta: DataFrame, n: Long, ng: Long)

  /** Materialize version `v`'s delta with the source-side probe metrics
    * riding its checkpoint job (the cdfApply fold, minus the per-file
    * hits — those depend on DESTINATION state at apply time, so a
    * prepared apply answers the hit set with the fallback broadcast
    * probe when delete/update keys exist). */
  private[graft] def prepareDelta(spark: SparkSession, src: String, v: Int,
      keyCol: String): PreparedDelta = {
    import org.apache.spark.sql.functions.{col => c}
    val isGone = c("_change_type").isin("delete", "update")
    val observed = cdfSlice(spark, src, v, keyCol)
      .observe("__cdf_pre", count(lit(1)).as("__n"),
        count(when(isGone, 1)).as("__ng"))
    val delta = observed.localCheckpoint()
    val row = observed.queryExecution.observedMetrics("__cdf_pre")
    PreparedDelta(delta, row.getAs[Long]("__n"), row.getAs[Long]("__ng"))
  }

  private[graft] def cdfApply(spark: SparkSession, src: String, dst: String,
      v: Int, keyCol: String, consumer: String, files: Int,
      evolveSchema: Boolean = false,
      prepared: Option[PreparedDelta] = None): Int = {
    import org.apache.spark.sql.functions.{col => c}
    val streamId = s"cdf:$consumer"
    if (TableLog.alreadyCommitted(spark, dst, streamId, v.toLong)) return -1
    // schema evolution across the replica (S12 x S17): when the source's
    // schema grew past the destination's, either refuse loudly (the
    // default — a replica silently missing columns is a divergence) or,
    // with evolveSchema, ADOPT the new columns atomically with this
    // apply: the evolved schema rides the same commit as the rewrite,
    // old destination files null-fill under it (the S12 read rule), and
    // the slice's post-images carry the new columns' values
    // (cdfSliceFrom's post-only path), so the evolution commit's
    // backfill replicates instead of vanishing
    val dstV = TableLog.currentVersion(spark, dst)
    val dstSchema0 = if (dstV > 0) TableLog.schemaAsOf(spark, dst, dstV) else None
    val srcSchemaOpt = TableLog.schemaAsOf(spark, src, v)
    // a destination WITHOUT a logged schema — cold start, or a prior
    // marker-only apply (the common first source commit is schema-only,
    // whose empty delta must still propagate the schema; r17 review) —
    // adopts the source's schema with this apply. A schema'd destination
    // takes the evolution path.
    val (dstSchema, schemaActs) = dstSchema0 match {
      case None =>
        (srcSchemaOpt, srcSchemaOpt.map(s => Action("schema", s.json)).toSeq)
      case Some(d) =>
        val srcSchema = srcSchemaOpt.getOrElse(throw new IllegalStateException(
          s"cdfApply needs a logged schema for $src@v$v — commit one at v1"))
        val missing = srcSchema.fields.filterNot(f =>
          d.fieldNames.contains(f.name))
        if (missing.isEmpty) (Some(d), Seq.empty[Action])
        else {
          require(evolveSchema,
            s"cdfApply: source v$v carries columns the destination lacks " +
              s"(${missing.map(_.name).mkString(", ")}) — pass " +
              "evolveSchema=true to adopt them, or evolve the destination first")
          val evolved = org.apache.spark.sql.types.StructType(d.fields ++ missing)
          (Some(evolved), Seq(Action("schema", evolved.json)))
        }
    }
    // the destination's live state is DRIVER-SIDE metadata (manifest
    // replay) — read it before any job so the probe below can ride the
    // delta's own materialization
    val dstState =
      if (dstV == 0) TableLog.LiveState(Nil, Nil)
      else TableLog.liveState(spark, dst, dstV)
    val (ranged, statless) = dstState.files.partition(
      _.stats.exists(_.col == keyCol))
    val isGone = c("_change_type").isin("delete", "update")
    // the rewrite set is computed per FILE, by interval overlap of each
    // destination file's manifest [min, max] against the DISTRIBUTED gone
    // keys — not against the keys' global [min, max] envelope (r16
    // review: a bimodal delta touching keys 10 and 10^9 must not rewrite
    // every file between them). A file without stats on keyCol can never
    // be excluded — stats skip work, never rows.
    //
    // ZERO extra jobs in the common case (r18): the probe's three answers
    // — "is the whole delta empty?", "any delete/update keys at all?",
    // "which ranged files do they overlap?" — ride the delta's OWN
    // localCheckpoint job as observed metrics (CollectMetrics
    // aggregates), where r17's fused left-outer probe still paid one
    // job wall per applied version. The per-file overlap test is one
    // tiny codegen'd `max(when(key between mn and mx, 1))` aggregate per
    // ranged destination file, built from bounds the driver ALREADY
    // holds (liveState is a driver-side manifest replay — no data, no
    // key, crosses to the driver). Gated by file count
    // (spark.graft.log.applyProbeInlineMaxFiles, default 64): past the
    // gate a mature table's wide file list would bloat one plan with
    // thousands of aggregates, so the hit set falls back to the r17
    // broadcast-join probe — one job, still bounded by |dst files|,
    // still no gone KEY ever on the driver or in a plan literal.
    val inlineProbe = prepared.isEmpty && dstV > 0 && ranged.nonEmpty &&
      dstSchema.exists(s => s.fieldNames.contains(keyCol) &&
        TableLog.isIntegral(s(keyCol).dataType)) &&
      ranged.size <= TableLog.confInt(
        spark, "spark.graft.log.applyProbeInlineMaxFiles", "64")
    // checkpoint the window delta (a PREPARED one arrives already
    // checkpointed with its source-side metrics — the lookahead path):
    // the range agg, the anti-join side, and the staged write would
    // otherwise each re-run cdfSlice's full-outer join over the window's
    // files. The observe node rides this one job and is truncated away
    // with the rest of the lineage — downstream consumers scan the
    // checkpointed rows, so no metric fires twice.
    val (delta, metric): (DataFrame, String => Long) = prepared match {
      case Some(p) =>
        (p.delta, { name: String =>
          if (name == "__n") p.n else if (name == "__ng") p.ng
          else throw new IllegalStateException(s"no prepared metric $name")
        })
      case None =>
        val metricCols =
          Seq(count(lit(1)).as("__n"), count(when(isGone, 1)).as("__ng")) ++
            (if (!inlineProbe) Nil
             else ranged.zipWithIndex.map { case (f, i) =>
               val s = f.stats.find(_.col == keyCol).get
               max(when(isGone && c(keyCol).cast("long") >= s.min &&
                 c(keyCol).cast("long") <= s.max, 1L).otherwise(0L)).as(s"__h$i")
             })
        val observed = cdfSlice(spark, src, v, keyCol)
          .observe("__cdf_probe", metricCols.head, metricCols.tail: _*)
        val ck = observed.localCheckpoint()
        // metrics read synchronously off the EXECUTED plan's accumulators
        // — not via Observation.get, whose latch waits on the async
        // listener bus (measured 30-150 ms of pure lag per version)
        val probe: org.apache.spark.sql.Row =
          observed.queryExecution.observedMetrics("__cdf_probe")
        (ck, { name: String =>
          probe.getAs[Any](name) match {
            case x: Number => x.longValue()
            case _ => 0L // max over zero rows observes null; only empty
          }
        })
    }
    val deltaEmpty = metric("__n") == 0L
    // an EMPTY feed (a source compaction / identical rewrite, or a bare
    // schema-evolution commit) records the version as applied — a
    // marker-only commit that still propagates the schema — BEFORE any
    // key-type contract fires: marker-only streams must not require an
    // integral key (r17 advice — a warm destination with a non-integral
    // key regained the marker path it had before the probe fusion).
    if (deltaEmpty)
      return TableLog.commitIfAbsent(spark, dst, streamId, v.toLong, schemaActs)
    // attempt-unique staging dir (commitBatch's discipline): a racing
    // re-delivery of the same version must never Overwrite-delete the
    // winner's committed files — the loser's staging stays orphaned for
    // vacuum, the txn gate stops its commit
    val rel = s"data/apply-v$v-${java.util.UUID.randomUUID}"
    if (dstV == 0) {
      // cold start (the first delta cannot rewrite anything, so no
      // gone-side work runs here): the pure-insert delta stages clustered
      // with stats under the SOURCE'S logged schema (authoritative for
      // types; the delta-derived shape is the fallback for a legacy
      // source that never logged one)
      val rows = delta.filter(c("_change_type") =!= "delete")
        .drop("_commit_version", "_change_type")
      val schActs =
        if (schemaActs.nonEmpty) schemaActs
        else Seq(Action("schema", rows.schema.json))
      return TableLog.commitIfAbsent(spark, dst, streamId, v.toLong,
        schActs ++ TableLog.stageWithStats(spark, dst, rows, rel, Seq(keyCol), files))
    }
    // copy-on-write semantics: only DELETE/UPDATE keys force a rewrite of
    // the files covering them — inserts just add files, so a pure append
    // (or a delete at one key plus an insert far away) rewrites NOTHING
    // it does not have to. keyCol must be integral (the stageWithStats
    // wire contract): a string key would cast its stats compare to null
    // and silently skip the rewrite — deletes unapplied, update
    // post-images still appended, duplicate keys in the destination.
    val keyType = dstSchema.get(keyCol).dataType
    require(TableLog.isIntegral(keyType),
      s"cdfApply needs an integral key; '$keyCol' is ${keyType.simpleString}")
    val gone = delta.filter(isGone)
      .select(c(keyCol).cast("long").as("__gone"))
    val goneEmpty = metric("__ng") == 0L
    val hitPaths: Set[String] =
      if (goneEmpty) Set.empty
      else if (inlineProbe)
        ranged.zipWithIndex.collect {
          case (f, i) if metric(s"__h$i") == 1L => f.path
        }.toSet
      else {
        // fallback for wide destinations: the r17 broadcast-join probe,
        // now inner (emptiness answers already rode the checkpoint) —
        // one job, hit set bounded by |dst files|
        import spark.implicits._
        val fileDf = ranged.map { f =>
          val s = f.stats.find(_.col == keyCol).get
          (f.path, s.min, s.max)
        }.toDF("__path", "__mn", "__mx")
        delta.filter(isGone).select(c(keyCol).cast("long").as("__g"))
          .join(broadcast(fileDf),
            c("__g") >= c("__mn") && c("__g") <= c("__mx"))
          .agg(collect_set(c("__path")).as("__hits"))
          .head().getSeq[String](0).toSet
      }
    val touched: Seq[TableLog.LiveFile] =
      if (goneEmpty) Seq.empty
      else statless ++ ranged.filter(f => hitPaths(f.path))
    // the touched files are read DV-AWARE (scanState scopes the dst's
    // live deletion vectors per file): a raw read would carry rows a dst
    // morDelete already hid into the re-staged files — which land at
    // dstV+1, ESCAPE the old DV's sequence-number scope, and resurrect
    // (the same invariant compactCommit's new-DV conflict guards)
    val base =
      if (touched.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[Row](), dstSchema.get)
      else TableLog.scanState(spark, dst, touched, dstState.dvs, dstSchema)
    val survivors = base.join(gone, c(keyCol) === c("__gone"), "left_anti")
    val arrivals = delta.filter(c("_change_type") =!= "delete")
      .drop("_commit_version", "_change_type")
    // allowMissingColumns carries the schema seams, null-filling either
    // side: survivors read under a just-evolved schema already have the
    // new columns (old files null-fill), arrivals may lack a column only
    // the DESTINATION has (a replicated update is a full-row replacement
    // — the source's image is authoritative, destination-local columns
    // reset to null for rewritten rows)
    val adds = TableLog.stageWithStats(spark, dst,
      survivors.unionByName(arrivals, allowMissingColumns = true),
      rel, Seq(keyCol), files)
    TableLog.commitIfAbsent(spark, dst, streamId, v.toLong,
      schemaActs ++ touched.map(f => Action("remove", f.path)) ++ adds)
  }

  /** S17 [EXT]: declared query — replicate the s14 source history into a
    * key-clustered downstream table by per-version [[cdfApply]] (with a
    * worst-case RE-DELIVERY of version 3, which must no-op at the txn
    * gate), then audit the destination's final snapshot per type. The
    * oracle recomputes the v4 commit rules directly — a replication that
    * dropped a delete, double-applied the re-delivery, or lost an
    * untouched file diverges on rows or hash; LakehouseSpec pins the
    * pruning (files outside the delta's key range survive byte-identical)
    * and the exactly-once gate. */
  def s17CowMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = s"${Etl.scratch(spark)}/s17_src_table"
    val dst = s"${Etl.scratch(spark)}/s17_dst_table"
    s14Fixture(spark, sfDir, src)
    new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(dst), true)
    // all four window deltas read only the (already fully built) source,
    // so they materialize in ONE concurrent round and each apply consumes
    // its prepared slice — the lookahead that overlaps the per-version
    // checkpoint jobs the sequential loop paid end to end
    val pres = TableLog.inParallel((1 to 4).map(v => () =>
      prepareDelta(spark, src, v, "event_id")))
    (1 to 4).foreach { v =>
      cdfApply(spark, src, dst, v, "event_id", "s17", files = 4,
        prepared = Some(pres(v - 1)))
      if (v == 3)
        require(cdfApply(spark, src, dst, 3, "event_id", "s17", 4) == -1,
          "re-delivered version must no-op at the txn gate")
    }
    TableLog.readAsOf(spark, dst, TableLog.currentVersion(spark, dst))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"),
        min($"value").as("min_value"))
      .orderBy($"event_type")
  }

  // ------------------------------- S18: merge-on-read deletes (deletion vectors)

  /** S18 [EXT]: merge-on-read DELETE — the complement of S17's
    * copy-on-write and the posture every production format ships for
    * fine-grained deletes at 100 TB (Delta deletion vectors, Iceberg v2
    * equality-delete files): the commit writes ONE small parquet of
    * deleted keys plus a one-line `dv` manifest action, and rewrites NO
    * data file. Readers anti-join the DV keys onto the (pruned) scan;
    * [[compactCommit]] absorbs live DVs into its packed rewrite, which is
    * what bounds how many a read ever stacks.
    *
    * Scoping is the sequence-number rule: a DV applies only to files
    * added BEFORE its commit, so re-inserting a deleted key later
    * survives ([[TableLog.LiveFile]]'s version). The key file is
    * self-describing — its single column's NAME is the key column it
    * deletes on — so the manifest line stays two fields and pre-S18 logs
    * replay unchanged.
    *
    * Cost shape: S17 rewrites O(files covering the keys) on every delete;
    * S18 writes O(deleted keys) at delete time and defers the rewrite to
    * the next OPTIMIZE — the right trade when deletes are frequent and
    * fine-grained (GDPR erasure, late-arriving retractions). Returns the
    * committed version. */
  def morDelete(spark: SparkSession, table: String, keys: DataFrame): Int = {
    require(keys.columns.length == 1,
      s"morDelete takes a single-column key frame; got ${keys.columns.mkString(", ")}")
    // the key file's column name is LOAD-BEARING (the self-describing
    // wire contract: readers join on it) — a DV committed under a name
    // the table schema lacks would poison EVERY subsequent read with an
    // unresolvable-column error; refuse at write time instead
    val cur = TableLog.currentVersion(spark, table)
    val keyCol = keys.columns.head
    if (cur > 0) TableLog.schemaAsOf(spark, table, cur).foreach { sch =>
      require(sch.fieldNames.contains(keyCol),
        s"morDelete key column '$keyCol' is not in the table schema " +
          s"(${sch.fieldNames.mkString(", ")}) — a committed DV under it " +
          "would fail every read")
    }
    val rel = s"data/dv/${java.util.UUID.randomUUID}"
    // one file: a DV is delete-volume-sized by contract (the broadcast
    // bound readers rely on) — a delete big enough to need many files
    // should be a copy-on-write rewrite (S17) instead
    keys.distinct().coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$table/$rel")
    val staged = TableLog.listStaged(spark, table, rel)
      .map(a => Action("dv", a.path))
    require(staged.nonEmpty, "morDelete staged no key file")
    // plain commit, not blind retry: delete-by-key does NOT commute with
    // a concurrent commit that re-inserts the key (the dv would scope
    // over the loser's files on retry) — a lost race surfaces loudly and
    // the caller decides, the compaction-conflict discipline. The commit
    // declares the `dv` reader feature (S21): a reader that skipped the
    // dv action would resurrect every deleted row, so the requirement is
    // stated on the wire, not assumed
    TableLog.commit(spark, table, Action("feature", "dv") +: staged)
  }

  /** S18 [EXT]: declared query — v1 stages the events table key-clustered
    * into 8 files; v2 MOR-deletes the sub-100 click keys (ONE key-file
    * write, zero data files touched — LakehouseSpec pins the files
    * byte-identical); v3 re-inserts a deterministic third of the deleted
    * keys with a +100000 value bump, which must SURVIVE the earlier DV
    * (sequence-number scoping). The audit reads every version:
    * n_bumped counts re-inserted rows (v1/v2 must be 0), and id_sum
    * catches a resurrected delete or a lost survivor. The oracle replays
    * the three commit rules directly. */
  def s18MorDelete(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s18_table"
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val doomed = ev.filter($"event_type" === "click" && $"value" < 100.0)
    val reinserted = doomed.filter($"event_id" % 3 === 0)
      .withColumn("value", $"value" + 100000.0)
    // both data file sets are pure functions of `ev`, so they stage in one
    // concurrent round (invisible until their commits); the commit order —
    // v1, the v2 DV delete, v3 — is unchanged, which is what the DV's
    // sequence-number scoping is measured against
    val Seq(v1Adds, v3Adds) = TableLog.inParallel(Seq(
      () => TableLog.stageWithStats(spark, table, ev, "data/v1", Seq("event_id"), 8),
      () => TableLog.stage(spark, table, reinserted, "data/v3")))
    TableLog.commit(spark, table, Action("schema", ev.schema.json) +: v1Adds)
    morDelete(spark, table, doomed.select($"event_id"))
    TableLog.commit(spark, table, v3Adds)
    (1 to 3).map { v =>
      TableLog.readAsOf(spark, table, v)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"),
          count(when($"value" >= 100000.0, 1)).as("n_bumped"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"id_sum", $"n_bumped")
    }.reduce(_ unionByName _).orderBy($"version")
  }

  // ------------------------- S20: merge-on-read UPSERT (DV + post-images)

  /** S20 [EXT]: merge-on-read UPSERT — the third leg of the merge family
    * (S17 rewrites the covering files copy-on-write; S18 deletes by DV;
    * this MERGEs by DV): ONE commit carries a deletion vector over the
    * upsert keys — hiding any existing copy in files added before it,
    * the S18 sequence-number scoping — plus the staged post-image rows,
    * which land AT the commit's version and therefore escape its own DV.
    * No existing data file is read or rewritten.
    *
    * Cost shape at 100 TB: an upsert touching k keys costs O(k) at write
    * time — one key-file parquet and the post-image stage — where S17
    * pays O(files covering the keys) in read+rewrite; the read-side tax
    * is the same broadcast anti-join every S18 DV already costs, and the
    * next OPTIMIZE ([[compactCommit]]) absorbs both. That is the
    * Delta-DV / Hudi-MOR upsert trade: frequent fine-grained upserts pay
    * at compaction time, not per commit.
    *
    * Contracts: `rows` must carry exactly the logged schema's columns
    * (an upsert is a full-row replacement — partial-column updates are a
    * read-modify-write, S17's job); `keyCol` must be key-unique in
    * `rows` AND in the table snapshot (the same uniqueness every CDF
    * consumer assumes — duplicate source keys would all land). Post-
    * images stage key-clustered with manifest stats when the key is
    * integral, so S15/S16 pruning and S17's covering-file bound survive
    * the merge. Plain commit, no blind retry: an upsert does not commute
    * with a concurrent commit touching the same keys (morDelete's
    * discipline — a lost race surfaces loudly and the caller decides).
    * Returns the committed version, or the current version unchanged for
    * an empty `rows` (a no-op MERGE commits nothing). */
  def morMerge(spark: SparkSession, table: String, rows: DataFrame,
      keyCol: String, files: Int = 1): Int = {
    val cur = TableLog.currentVersion(spark, table)
    require(cur > 0, "morMerge upserts into an existing table — commit a v1 first")
    val sch = TableLog.schemaAsOf(spark, table, cur).getOrElse(
      throw new IllegalArgumentException(
        s"morMerge needs a logged schema for $table — commit one at v1"))
    require(sch.fieldNames.contains(keyCol),
      s"morMerge key column '$keyCol' is not in the table schema " +
        s"(${sch.fieldNames.mkString(", ")})")
    require(rows.columns.toSet == sch.fieldNames.toSet,
      s"morMerge post-images must carry exactly the logged schema " +
        s"(${sch.fieldNames.mkString(", ")}); got ${rows.columns.mkString(", ")} " +
        "— a partial-column update is a read-modify-write (S17), not a MOR merge")
    // names AND types: a type-mismatched post-image file would commit
    // fine and then fail EVERY subsequent read under the logged schema —
    // a corrupted-table crash long after the write (r17 review); refuse
    // at merge time like the other contracts here
    sch.fields.foreach { f =>
      val got = rows.schema(f.name).dataType
      require(got == f.dataType,
        s"morMerge post-image column '${f.name}' is ${got.simpleString}; " +
          s"the logged schema says ${f.dataType.simpleString}")
    }
    // pin the source ONCE (cdfApply's localCheckpoint discipline): the DV
    // keys and the staged post-images are both derived from `rows`, and a
    // nondeterministic frame (a LIMIT without ORDER, a sampled filter)
    // re-evaluated per pass would commit a DV that hides keys whose
    // post-images never landed — silent row loss inside one commit.
    // The empty-source test rides the checkpoint job as an observed
    // count (cdfApply's r18 probe fold) instead of a separate take(1);
    // read off the executed plan, not the async-listener Observation.
    val observed = rows.select(sch.fieldNames.toSeq.map(col): _*)
      .observe("__merge_probe", count(lit(1)).as("__n"))
    val post = observed.localCheckpoint()
    // an empty MERGE source must not commit a zero-key DV
    if (observed.queryExecution.observedMetrics("__merge_probe")
        .getAs[Long]("__n") == 0L) return cur
    // the DV key file (morDelete's self-describing wire: the single
    // column's NAME is the key column, one file by the delete-volume
    // broadcast contract) and the post-image stage are INDEPENDENT writes
    // off the same checkpointed frame into disjoint staging dirs — they
    // run concurrently (inParallel, the fixture-staging discipline) and
    // stay invisible until the single commit below publishes both
    val dvRel = s"data/dv/${java.util.UUID.randomUUID}"
    val addRel = s"data/merge/${java.util.UUID.randomUUID}"
    val Seq(dvActs, adds) = TableLog.inParallel(Seq(
      () => {
        post.select(col(keyCol)).distinct().coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$table/$dvRel")
        TableLog.listStaged(spark, table, dvRel).map(a => Action("dv", a.path))
      },
      // post-images: clustered with stats when the key can carry them
      // (stageWithStats' integral wire contract), plain otherwise — stats
      // skip work, never rows, so a statless merge file is just unprunable
      () =>
        if (TableLog.isIntegral(sch(keyCol).dataType))
          TableLog.stageWithStats(spark, table, post, addRel, Seq(keyCol), files)
        else TableLog.stage(spark, table, post, addRel)))
    require(dvActs.nonEmpty, "morMerge staged no key file")
    // declares the `dv` reader feature (S21, morDelete's discipline)
    TableLog.commit(spark, table,
      Action("feature", "dv") +: (dvActs ++ adds))
  }

  /** S20 [EXT]: declared query — v1 stages the events table key-clustered
    * into 8 files with stats; v2 MOR-merges an update of every cheap
    * 'view' row (+500000 value bump, full-row post-images) UNION a pure
    * insert of new keys (cheap 'signup' rows re-keyed +10^7) in ONE
    * commit, zero data files touched; v3 re-merges a deterministic third
    * of the v2-updated keys (+500000 again — the stacked-DV path: v3's
    * DV must hide v2's post-image file for those keys while v3's own
    * post-images escape). The audit reads every version with disjoint
    * detectors: n_up1 counts once-updated rows, n_up2 twice-updated,
    * n_ins inserted keys — a resurrected pre-image, a lost survivor, a
    * double-applied merge, or a DV scoped over its own commit's adds
    * each flips a detector. The oracle replays the three commit rules
    * directly. */
  def s20MorMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s20_table"
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    TableLog.commit(spark, table, Action("schema", ev.schema.json) +:
      TableLog.stageWithStats(spark, table, ev, "data/v1", Seq("event_id"), 8))
    val upd1 = ev.filter($"event_type" === "view" && $"value" < 100.0)
      .withColumn("value", $"value" + 500000.0)
    val ins1 = ev.filter($"event_type" === "signup" && $"value" < 50.0)
      .withColumn("event_id", $"event_id" + 10000000L)
    morMerge(spark, table, upd1.unionByName(ins1), "event_id", files = 2)
    val upd2 = upd1.filter($"event_id" % 3 === 0)
      .withColumn("value", $"value" + 500000.0)
    morMerge(spark, table, upd2, "event_id", files = 1)
    (1 to 3).map { v =>
      TableLog.readAsOf(spark, table, v)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"),
          count(when($"value" >= 500000.0 && $"value" < 1000000.0, 1)).as("n_up1"),
          count(when($"value" >= 1000000.0, 1)).as("n_up2"),
          count(when($"event_id" >= 10000000L, 1)).as("n_ins"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"id_sum",
          $"n_up1", $"n_up2", $"n_ins")
    }.reduce(_ unionByName _).orderBy($"version")
  }

  // --------------------- R17: exactly-once log-tail relay (src log → dst log)

  /** R17 [EXT]: incremental table-to-table relay — the continuous
    * bronze→silver pipeline every lakehouse deployment runs, composed
    * from parts this log already has: the source's change feed (S14)
    * names what moved, [[cdfApply]] lands each version as one pruned
    * copy-on-write commit, and the destination log's OWN txn markers are
    * the resume offset. A restarted relay calls
    * [[TableLog.lastCommitted]] on the destination and continues from
    * the next source version — there is no external offset store
    * (checkpoint directory, consumer-group coordinator) to lose, lag
    * behind, or double-apply against, and a re-delivered version still
    * no-ops at cdfApply's per-version txn gate (belt and braces: the
    * offset probe optimizes, the gate guarantees).
    *
    * At 100 TB: each tick costs O(changed data in the window), never
    * O(table) — the S14/S17 bound — and the offset probe is O(commits
    * since the destination's last checkpoint) (S19). The destination
    * auto-checkpoints every `spark.graft.log.checkpointInterval` commits
    * (the R15 sink's conf), since a long-lived relay is exactly the
    * writer whose manifest chain and offset probe grow without bound.
    * Drive it from any scheduler — a Structured Streaming foreachBatch
    * tick (StreamingSpec does), cron, or a loop. With `evolveSchema` the
    * relay also propagates source schema evolution: a column-adding
    * commit evolves the destination atomically with its apply and the
    * backfill's new-column values replicate (default: refuse loudly —
    * a replica silently missing columns is a divergence). Returns the
    * source versions applied this tick (empty = caught up). */
  def relay(spark: SparkSession, src: String, dst: String, keyCol: String,
      consumer: String, files: Int = 4, evolveSchema: Boolean = false): Seq[Int] = {
    val streamId = s"cdf:$consumer"
    val every = TableLog.confInt(spark, "spark.graft.log.checkpointInterval", "0")
    val from = TableLog.lastCommitted(spark, dst, streamId)
      .map(_.toInt).getOrElse(0)
    val to = TableLog.currentVersion(spark, src)
    // prepared-delta lookahead: within a tick the source is fixed, so a
    // multi-version catch-up window materializes its slices concurrently
    // in bounded batches (spark.graft.log.applyPrefetch, default 4 —
    // bounds how many checkpointed window deltas are live at once after
    // a long downtime) while the applies commit strictly in order
    val prefetch = math.max(1, TableLog.confInt(
      spark, "spark.graft.log.applyPrefetch", "4"))
    val applied = ((from + 1) to to).grouped(prefetch).flatMap { batch =>
      val pres =
        if (batch.size <= 1) batch.map(v => None)
        else TableLog.inParallel(batch.map(v => () =>
          prepareDelta(spark, src, v, keyCol))).map(Some(_))
      batch.zip(pres).map { case (v, pre) =>
        val dstV = cdfApply(spark, src, dst, v, keyCol, consumer, files,
          evolveSchema, prepared = pre)
        if (every > 0 && dstV > 0 && dstV % every == 0)
          TableLog.checkpointLog(spark, dst)
        v
      }
    }.toSeq
    // conf-gated auto-OPTIMIZE (the [[maybeOptimize]] policy): a
    // long-lived relay is exactly the writer whose destination
    // accumulates apply files without bound. Checked only on ticks that
    // moved data; the packed files re-carry key stats when the key can
    // hold them (the stageWithStats wire), so maintenance never erases
    // the pruning the applies rely on
    if (applied.nonEmpty) {
      val kt = TableLog.schemaAsOf(spark, dst,
        TableLog.currentVersion(spark, dst)).map(_(keyCol).dataType)
      maybeOptimize(spark, dst,
        if (kt.exists(TableLog.isIntegral)) Seq(keyCol) else Nil)
    }
    applied
  }

  /** R17 [EXT]: declared query — the relay driven through four ticks of a
    * GROWING source: tick 1 catches up from cold over the first two
    * commits (the mod-4 split), tick 2 finds nothing new and must apply
    * ZERO (the resume offset read back from the destination's own log),
    * tick 3 relays the click rewrite (deletes only — identical re-adds
    * must not move), tick 4 the error backfill (updates). Each tick's
    * audit row carries how many versions the relay applied plus the
    * destination rollup; the oracle replays the source commit rules at
    * each prefix — a relay that re-applied on tick 2, missed a delete,
    * or fed the backfill twice diverges on n_applied, rows, or hash. */
  def r17LogRelay(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = s"${Etl.scratch(spark)}/r17_src_table"
    val dst = s"${Etl.scratch(spark)}/r17_dst_table"
    val fs = new Path(src).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(src, dst).foreach(t => fs.delete(new Path(t), true))
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // the buildFixture commit rules, landed tick-by-tick so the source
    // genuinely grows between relay calls
    val types = ev.select($"event_type").distinct()
      .orderBy($"event_type").as[String].collect().toSeq
    // ALL FOUR ticks' file sets stage in ONE concurrent round up front:
    // every staged slice is a pure function of `ev` (never of a commit),
    // and staged dirs are invisible until their manifest lands, so the
    // source STILL grows tick-by-tick exactly as before — the relay
    // observes the identical commit sequence, minus three staging rounds
    // of per-job floor between ticks. Remove sets stay commit-time
    // metadata (computed from the actual manifests below).
    def typedTasks(df: DataFrame, v: Int): Seq[() => Seq[Action]] =
      types.map(t => () => TableLog.stage(spark, src,
        df.filter($"event_type" === t), s"data/v$v/$t"))
    val staged = TableLog.inParallel(
      typedTasks(ev.filter($"event_id" % 4 =!= 3), 1) ++
        typedTasks(ev.filter($"event_id" % 4 === 3), 2) ++ Seq(
        () => TableLog.stage(spark, src,
          ev.filter($"event_type" === "click" && $"value" >= 100.0), "data/v3/click"),
        () => TableLog.stage(spark, src,
          ev.filter($"event_type" === "error").withColumn("value", $"value" + 1.0),
          "data/v4/error")))
    val (v1Adds, v2Adds) = (staged.take(types.size).flatten,
      staged.slice(types.size, 2 * types.size).flatten)
    val (v3Adds, v4Adds) = (staged(2 * types.size), staged(2 * types.size + 1))
    def audit(tick: Int, applied: Int): DataFrame =
      TableLog.readAsOf(spark, dst, TableLog.currentVersion(spark, dst))
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"),
          count(when($"event_type" === "error" && $"value" >= 100.0, 1))
            .as("n_err_hi"))
        .select(lit(tick.toLong).as("tick"),
          lit(applied.toLong).as("n_applied"), $"n_rows", $"id_sum", $"n_err_hi")
    TableLog.commit(spark, src, Action("schema", ev.schema.json) +: v1Adds)
    TableLog.commit(spark, src, v2Adds)
    val a1 = audit(1, relay(spark, src, dst, "event_id", "r17").size)
    // caught up: the offset comes back from the DESTINATION's txn markers
    val a2 = audit(2, relay(spark, src, dst, "event_id", "r17").size)
    val retired3 = TableLog.liveFiles(spark, src, 2).filter(_.contains("/click/"))
    TableLog.commit(spark, src, retired3.map(Action("remove", _)) ++ v3Adds)
    val a3 = audit(3, relay(spark, src, dst, "event_id", "r17").size)
    val retired4 = TableLog.liveFiles(spark, src, 3).filter(_.contains("/error/"))
    TableLog.commit(spark, src, retired4.map(Action("remove", _)) ++ v4Adds)
    val a4 = audit(4, relay(spark, src, dst, "event_id", "r17").size)
    Seq(a1, a2, a3, a4).reduce(_ unionByName _).orderBy($"tick")
  }

  // --------------------------------------------------- S19: log checkpoints

  private[graft] val S19_COMMITS = 12
  private[graft] val S19_CKPT_AT = 8

  /** S19 [EXT]: declared query — twelve micro-batch commits with a log
    * CHECKPOINT after the eighth ([[TableLog.checkpointLog]]), then audit
    * the checkpointed version and the head. Reads at or past v8 replay
    * the checkpoint plus ≤4 manifests instead of the whole chain — the
    * `_last_checkpoint` posture every production log format ships,
    * because at 100 TB the manifest chain is 10^5–10^6 commits and
    * O(lifetime) replay per read (and per exactly-once txn probe) is the
    * metadata bottleneck. The oracle replays the mod-12 commit rules; a
    * checkpoint that dropped a file, collapsed add versions (widening DV
    * scope), or lost a txn marker diverges here or in LakehouseSpec's
    * pins (head reads survive pre-checkpoint manifest loss; DV scoping
    * and the re-delivery gate hold across the checkpoint). */
  def s19LogCheckpoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s19_table"
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // twelve disjoint micro-batch file sets stage concurrently; the
    // twelve commits (and the mid-history checkpoint after the eighth)
    // stay strictly ordered — the log readers replay is byte-identical
    val staged = TableLog.inParallel((0 until S19_COMMITS).map(b => () =>
      TableLog.stage(spark, table,
        ev.filter($"event_id" % S19_COMMITS === b), s"data/b$b")))
    staged.zipWithIndex.foreach { case (adds, b) =>
      TableLog.commit(spark, table,
        if (b == 0) Action("schema", ev.schema.json) +: adds else adds)
      if (b == S19_CKPT_AT - 1)
        require(TableLog.checkpointLog(spark, table) == S19_CKPT_AT,
          "checkpoint must land at the current version")
    }
    Seq(S19_CKPT_AT, S19_COMMITS).map { v =>
      TableLog.readAsOf(spark, table, v)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"id_sum")
    }.reduce(_ unionByName _).orderBy($"version")
  }

  // ------------------------------------------------- S16: Z-order clustering

  /** Morton (Z-curve) value of two non-negative long columns, each first
    * scaled linearly into `bits` bits against its [lo, hi] domain: the
    * interleaved-bit cluster key that makes ONE sort order serve range
    * predicates on BOTH dimensions. Built entirely from codegen'd bit
    * functions (shiftright/and/shiftleft chains — no UDF): 2·`bits`
    * unrolled terms OR-folded, whole-stage-compiled like any arithmetic.
    * 16 bits per dimension is plenty for file-level skipping — the curve
    * only has to separate files, not rows. */
  def zOrderValue(a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long, bits: Int = 16): Column = {
    val scale = (1L << bits) - 1
    // divide-FIRST scaling: the multiply-first form ((c-lo)*scale/(hi-lo))
    // wraps when the domain exceeds 2^(63-bits) (~2^47 at 16 bits) — a
    // snowflake-style 10^18 id domain would silently emit wrapped negative
    // Morton keys and collapse clustering quality (reads stay correct —
    // stats come from file contents — but the layout stops separating).
    // A wide domain divides by a power of two applied as an unsigned
    // shift: exact at any width (Column./ is DOUBLE division — lossy past
    // 2^53), monotone, in [0, scale] since 2^shift >= width/scale. A
    // NARROW domain (width <= scale) instead multiplies UP by an integer
    // factor so the dimension still occupies the full bit budget —
    // otherwise an asymmetric pair (ids in millions × a small enum) lets
    // the wide dimension's high bits own the curve's top and the narrow
    // one stops separating files. The upscale product is overflow-safe by
    // construction (d <= scale < 2^bits, f <= 2^bits). Width is computed
    // in BigInt so a [~Long.Min, ~Long.Max] domain fails loudly instead
    // of wrapping.
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else {
        val width = BigInt(hi) - BigInt(lo)
        require(width <= BigInt(Long.MaxValue),
          s"z-order domain [$lo, $hi] wider than 2^63 — split the dimension")
        val d = (c - lit(lo)).cast("long")
        if (width <= scale) d * lit((scale + 1) / (width.toLong + 1))
        else shiftrightunsigned(d, 64 -
          java.lang.Long.numberOfLeadingZeros(width.toLong / (scale + 1)))
      }
    val na = norm(a, aLo, aHi)
    val nb = norm(b, bLo, bHi)
    (0 until bits).map { k =>
      shiftleft(shiftrightunsigned(na, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(nb, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_ bitwiseOR _)
  }

  private[graft] val S16_FILES = 16
  private[graft] val S16_LO = 100L
  private[graft] val S16_HI = 299L

  /** s16's fixture: events staged in ONE commit, clustered on the
    * Z-value of (event_id, user_id) with manifest stats recorded for
    * BOTH columns — the multi-dimensional data-skipping layout. Domain
    * bounds for the bit scaling come from one bounded min/max pass (the
    * same write-time cost class as the stats pass itself). */
  private[graft] def s16Fixture(spark: SparkSession, sfDir: String,
      table: String): Unit = {
    import spark.implicits._
    new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(table), true)
    val ev = Tables.events(spark, sfDir)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val Row(eLo: Long, eHi: Long, uLo: Long, uHi: Long) = ev
      .agg(min($"event_id"), max($"event_id"), min($"user_id"), max($"user_id"))
      .head()
    val z = zOrderValue($"event_id", eLo, eHi, $"user_id", uLo, uHi)
    TableLog.commit(spark, table, Action("schema", ev.schema.json) +:
      TableLog.stageWithStats(spark, table, ev, "data/z1",
        Seq("event_id", "user_id"), S16_FILES, orderBy = Some(z)))
  }

  /** S16 [EXT]: declared query — a range read on the SECOND Z-order
    * dimension (user_id) over the Z-clustered table: the manifest prunes
    * the file list by user_id's per-file stats even though no file is
    * sorted by user_id alone — the property a single-column cluster
    * (S9/S15) cannot offer, and the reason production formats Z-ORDER
    * their OPTIMIZE output. The oracle runs the same predicate over the
    * source; LakehouseSpec pins the skipping itself on BOTH dimensions
    * (each predicate's kept set is a strict subset, and equals the
    * stats-overlap computation). */
  def s16ZorderScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s16_table"
    s16Fixture(spark, sfDir, table)
    TableLog.readAsOfRange(spark, table, 1, "user_id", S16_LO, S16_HI)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type")
  }

  // --------------------------------------------- warm serving rows (r17)

  private val lakeWarmLock = new Object

  /** Warm-fixture ensure for the whole r16 lakehouse family — the
    * s11_warm_read idiom (TableLog.ensureWarmFixture) applied to
    * S13–S17/MV2 (r16 verdict item 2): the multi-commit physical logs are
    * built ONCE per source generation and stamped, so the declared
    * `*_warm` rows price the warm READ/APPLY loop a deployment actually
    * runs, instead of re-paying dozens of small fixture parquet writes
    * inside every measurement. Contents:
    *  - `src`: the s14 four-commit history (shared, READ-ONLY — s14/s17/
    *    mv2 warm rows read it; nothing mutates it),
    *  - `mv2_state_v2`: the persisted v2 view state mv2's refresh folds,
    *  - `packed`: the s13 eight-commit fragmented table WITH its OPTIMIZE
    *    commit already landed (v9), so both layouts are readable,
    *  - `s15t`/`s16t`: the stats-carrying and Z-clustered tables.
    * Returns the fixture root. */
  private[graft] def ensureLakeFixture(spark: SparkSession, sfDir: String): String =
    lakeWarmLock.synchronized {
      import spark.implicits._
      val root = s"${Etl.scratch(spark)}/lake_warm"
      val fp = TableLog.eventsFp(sfDir)
      val marker = java.nio.file.Paths.get(s"$root/_GRAFT_SOURCE")
      val fresh = java.nio.file.Files.isRegularFile(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker), "UTF-8") == fp &&
        TableLog.currentVersion(spark, s"$root/src") == 4 &&
        TableLog.currentVersion(spark, s"$root/packed") == S13_BATCHES + 1 &&
        TableLog.currentVersion(spark, s"$root/s15t") == 2 &&
        TableLog.currentVersion(spark, s"$root/s16t") == 1 &&
        java.nio.file.Files.isDirectory(
          java.nio.file.Paths.get(s"$root/mv2_state_v2"))
      if (!fresh) {
        new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(new Path(root), true)
        s14Fixture(spark, sfDir, s"$root/src")
        TableLog.readAsOf(spark, s"$root/src", 2)
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_rows"), min($"value").as("min_value"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$root/mv2_state_v2")
        s13Fixture(spark, sfDir, s"$root/packed")
        compactCommit(spark, s"$root/packed", S13_TARGET_FILES)
        s15Fixture(spark, sfDir, s"$root/s15t")
        s16Fixture(spark, sfDir, s"$root/s16t")
        java.nio.file.Files.createDirectories(marker.getParent)
        java.nio.file.Files.write(marker, fp.getBytes("UTF-8"))
      }
      root
    }

  /** S13 warm path [EXT]: the pre/post-OPTIMIZE audit over the PREBUILT
    * packed log — prices manifest replay plus the fragmented (32-file)
    * and packed (2-file) snapshot reads, not the fixture's 32 parquet
    * writes. Oracle identical to the cold row (both snapshots ≡ source,
    * file counts literal). */
  def s13WarmRead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${ensureLakeFixture(spark, sfDir)}/packed"
    def audit(v: Int): DataFrame = {
      val nFiles = TableLog.liveFiles(spark, table, v).size.toLong
      TableLog.readAsOf(spark, table, v)
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
        .select(lit(v.toLong).as("version"), $"n_rows", $"id_sum",
          lit(nFiles).as("n_files"))
    }
    audit(S13_BATCHES).unionByName(audit(S13_BATCHES + 1)).orderBy($"version")
  }

  /** S14 warm path [EXT]: the full change feed of the prebuilt history —
    * prices the per-commit full-outer joins over the window's files (the
    * subscription read a consumer polls), zero fixture writes. */
  def s14WarmFeed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${ensureLakeFixture(spark, sfDir)}/src"
    cdfRead(spark, table, 0, 4, "event_id")
      .groupBy($"_commit_version".as("version"), $"_change_type".as("change_type"))
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"version", $"change_type")
  }

  /** S15 warm path [EXT]: the manifest-pruned range read over the
    * prebuilt stats-carrying table — the steady-state serving read
    * (manifest replay + ~2 of 12 files opened), no stage pass. */
  def s15WarmSkip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${ensureLakeFixture(spark, sfDir)}/s15t"
    TableLog.readAsOfRange(spark, table, 2, "event_id", S15_LO, S15_HI)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type")
  }

  /** S16 warm path [EXT]: the second-dimension range read over the
    * prebuilt Z-clustered table — prices the multi-dimensional manifest
    * pruning + pruned scan, not the Z-sort write. */
  def s16WarmScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${ensureLakeFixture(spark, sfDir)}/s16t"
    TableLog.readAsOfRange(spark, table, 1, "user_id", S16_LO, S16_HI)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type")
  }

  /** S17 warm path [EXT]: the four-version CDF apply loop against the
    * PREBUILT source history — the replication work itself (feed join,
    * file pruning, survivor anti-join, clustered re-stage ×4) into a
    * fresh per-run destination; the source's fixture build is amortized
    * away. The destination writes are the operator, not fixture tax. */
  def s17WarmApply(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = s"${ensureLakeFixture(spark, sfDir)}/src"
    val dst = s"${Etl.scratch(spark)}/s17_warm_dst"
    new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(dst), true)
    // prepared-delta lookahead (the s17CowMerge discipline): the source
    // history is prebuilt, so the four slices materialize concurrently
    val pres = TableLog.inParallel((1 to 4).map(v => () =>
      prepareDelta(spark, src, v, "event_id")))
    (1 to 4).foreach(v => cdfApply(spark, src, dst, v, "event_id", "s17w", 4,
      prepared = Some(pres(v - 1))))
    TableLog.readAsOf(spark, dst, TableLog.currentVersion(spark, dst))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"),
        min($"value").as("min_value"))
      .orderBy($"event_type")
  }

  /** MV2 warm path [EXT]: one CDF-targeted partial refresh from the
    * PERSISTED v2 state over the prebuilt (2, 4] window — the production
    * tick (feed → touched keys → semi/anti joins), not the state build. */
  def mv2WarmRefresh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val root = ensureLakeFixture(spark, sfDir)
    val state = Tables.readMemo(spark, s"$root/mv2_state_v2")
    def view(df: DataFrame): DataFrame =
      df.groupBy($"event_type")
        .agg(count(lit(1)).as("n_rows"), min($"value").as("min_value"))
    mv2Refresh(spark, s"$root/src", state, 2, 4, "event_type")(view)
      .orderBy($"event_type")
  }

  /** S15 [EXT]: declared query — a range read over the stats-carrying log
    * ([[TableLog.readAsOfRange]]: the file list pruned from the MANIFEST
    * before any footer opens), rolled up per event_type. The oracle runs
    * the same range predicate over the full source — pruning that drops a
    * file it shouldn't loses rows and fails the hash; LakehouseSpec pins
    * the part SQL can't see (the scan's file set actually shrank, and
    * matches exactly the stats-overlapping files). */
  def s15StatsSkipping(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val table = s"${Etl.scratch(spark)}/s15_table"
    s15Fixture(spark, sfDir, table)
    TableLog.readAsOfRange(spark, table, 2, "event_id", S15_LO, S15_HI)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("id_sum"))
      .orderBy($"event_type")
  }
}
