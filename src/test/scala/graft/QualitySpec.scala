package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Semantics of the round-4 additions: latest-wins compaction, the
  * one-pass profile, the relative-rank family, grouping sets, and
  * unpivot (pivot's inverse). The oracle already hash-checks values;
  * these assert the invariants a hash can't state. */
class QualitySpec extends SparkSpecBase {

  test("U1 keeps exactly one row per key and it is the newest") {
    import spark.implicits._
    val events = Seq(
      // (user, type, event_id, ts, value) — key (1,a) has 3 versions incl. a ts tie
      (1L, "a", 10L, "2024-01-01 00:00:01", 1.0),
      (1L, "a", 11L, "2024-01-01 00:00:02", 2.0),
      (1L, "a", 12L, "2024-01-01 00:00:02", 3.0), // wins: ts tie, higher id
      (1L, "b", 13L, "2024-01-01 00:00:00", 4.0),
      (2L, "a", 14L, "2024-01-01 00:00:09", 5.0))
      .toDF("user_id", "event_type", "event_id", "s", "value")
      .withColumn("ts", $"s".cast("timestamp")).drop("s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"ts".desc, $"event_id".desc)
    val out = events.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map((1L, "a") -> 12L, (1L, "b") -> 13L, (2L, "a") -> 14L))
    // and the operator over the fixture dir: one row per key, keys preserved
    val op = Quality.u1LatestWins(spark, sfDir)
    assert(op.groupBy("user_id", "event_type").count().filter($"count" > 1).count() === 0)
    assert(op.count() ===
      Tables.events(spark, sfDir).select("user_id", "event_type").distinct().count())
  }

  test("DQ1 profile terms are internally consistent") {
    import spark.implicits._
    val row = Quality.dq1QualityProfile(spark, sfDir).head()
    val (n, nullProps, distinct, dups) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(n === Tables.events(spark, sfDir).count())
    assert(distinct + dups === n)
    assert(nullProps >= 0 && nullProps <= n)
    assert(row.getLong(5) <= row.getLong(6)) // min_ts <= max_ts
  }

  test("W5 quartiles are balanced within each priority class") {
    import spark.implicits._
    val sizes = Windows.w5RankFamily(spark, sfDir)
      .groupBy($"o_orderpriority", $"quartile").count()
      .groupBy($"o_orderpriority")
      .agg((max($"count") - min($"count")).as("spread"), count(lit(1)).as("q"))
      .collect()
    // ntile(4): bucket sizes differ by at most 1, and all 4 buckets exist
    assert(sizes.forall(r => r.getLong(1) <= 1 && r.getLong(2) === 4))
    // pct_rank and cume are in [0,1] with cume strictly positive
    val bounds = Windows.w5RankFamily(spark, sfDir)
      .agg(min($"pct_rank"), max($"pct_rank"), min($"cume"), max($"cume")).head()
    assert(bounds.getDouble(0) === 0.0 && bounds.getDouble(1) <= 1.0)
    assert(bounds.getDouble(2) > 0.0 && bounds.getDouble(3) === 1.0)
  }

  test("A5d grouping sets = union of its member group-bys, via one Expand") {
    import spark.implicits._
    val gs = Analytics.a5dGroupingSets(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val both = li.groupBy("l_returnflag", "l_linestatus").count().count()
    val flag = li.groupBy("l_returnflag").count().count()
    assert(gs.count() === both + flag + 1)
    // single shuffle: the plan expands rows once, not once per set
    val plan = gs.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // agg + final orderBy
    assert(plan.contains("Expand"), plan)
  }

  test("A12 unpivot is the exact inverse of pivoting back") {
    import spark.implicits._
    val long = Analytics.a12Unpivot(spark, sfDir)
    val wide = long.groupBy("p_partkey").pivot("metric", Seq("size", "retailprice"))
      .agg(first($"value"))
      .select($"p_partkey", $"size", $"retailprice")
    val src = Tables.part(spark, sfDir)
      .select($"p_partkey", $"p_size".cast("double").as("size"),
        $"p_retailprice".as("retailprice"))
    assert(wide.except(src).count() === 0 && src.except(wide).count() === 0)
  }

  test("L10 redacts planted emails and digit runs, leaves prose intact") {
    import spark.implicits._
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val digits = "[0-9]{9,}"
    val out = Seq("reach me at bob.smith+x@corp.example.org or 12345678901 thanks")
      .toDF("raw")
      .select(regexp_replace(regexp_replace($"raw", email, "<EMAIL>"), digits, "<NUM>").as("c"))
      .head().getString(0)
    assert(out === "reach me at <EMAIL> or <NUM> thanks")
    // short numbers survive (8 digits is below the threshold)
    val keep = Seq("order 12345678 ok").toDF("raw")
      .select(regexp_replace($"raw", digits, "<NUM>").as("c")).head().getString(0)
    assert(keep === "order 12345678 ok")
    // the operator itself: every row gains exactly one email + one number
    val op = graft.llm.TextAnalysis.l10PiiRedact(spark, sfDir)
    assert(op.filter($"n_emails" =!= 1L || $"n_nums" =!= 1L).count() === 0)
  }

  test("F15 levenshtein matches the textbook distance on knowns") {
    import spark.implicits._
    val d = Seq(("kitten", "sitting"), ("flaw", "lawn"), ("", "abc"), ("same", "same"))
      .toDF("a", "b").select(levenshtein($"a", $"b").as("d"))
      .collect().map(_.getInt(0)).toSeq
    assert(d === Seq(3, 2, 3, 0))
  }

  test("L4g drops exactly floor(n/4) documents per language") {
    import spark.implicits._
    // the oracle hash-checks values; this pins the SELECTION CARDINALITY
    // the two-phase order statistic must deliver, per stratum
    val out = graft.llm.TextAnalysis.l4gQualityFilter(spark, "/root/testdata/sf0.01")
    val perLang = out.groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum(when($"keep", 0L).otherwise(1L)).as("dropped"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      val (n, dropped) = (r.getAs[Long]("n"), r.getAs[Long]("dropped"))
      assert(dropped === (if (n >= 4) n / 4 else 0L), s"lang ${r.get(0)}")
    }
  }

  test("U2 SCD2: intervals chain gaplessly, one current row per entity, u1 = current slice") {
    import spark.implicits._
    val h = Quality.u2Scd2(spark, sfDir).cache()
    // versions dense from 1; valid_from strictly precedes valid_to;
    // consecutive versions chain exactly (no gap, no overlap)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"version")
    val chained = h
      .withColumn("prev_v", lag($"version", 1).over(w))
      .withColumn("prev_to", lag($"valid_to_us", 1).over(w))
    assert(chained.filter($"prev_v".isNull && $"version" =!= 1).count() === 0)
    assert(chained.filter($"prev_v".isNotNull && $"version" =!= $"prev_v" + 1).count() === 0)
    assert(chained.filter($"prev_to".isNotNull && $"prev_to" =!= $"valid_from_us").count() === 0)
    assert(h.filter($"valid_to_us".isNotNull && $"valid_to_us" < $"valid_from_us").count() === 0)
    // exactly one open (current) version per entity attribute
    assert(h.groupBy($"user_id", $"event_type")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("open"))
      .filter($"open" =!= 1).count() === 0)
    // and u1's latest-wins snapshot is exactly the is_current slice
    val current = h.filter($"is_current").select($"user_id", $"event_type", $"event_id", $"value")
    val u1 = Quality.u1LatestWins(spark, sfDir)
    assert(current.exceptAll(u1).count() === 0 && u1.exceptAll(current).count() === 0)
    h.unpersist()
  }

  test("U3 merge: independent union-window derivation agrees; all four branches occur") {
    import spark.implicits._
    val m = Quality.u3MergeUpsert(spark, sfDir).cache()
    // output unique per key
    assert(m.groupBy($"user_id", $"event_type").count().filter($"count" > 1).count() === 0)
    // independent restatement of MERGE: union the (tagged) compacted
    // sides, let a change row beat its base row by window rank instead of
    // by join side, then drop keys whose winner is a delete — a different
    // plan shape (window over union vs full-outer join) that must reach
    // the identical table
    val cut = lit("2024-01-20").cast("timestamp")
    val ev = Tables.events(spark, sfDir)
    val kw = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"ts".desc, $"event_id".desc)
    def compact(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(kw)).filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", $"value")
    val base = compact(ev.filter($"ts" < cut && $"event_type" =!= "signup"))
      .withColumn("src", lit(0))
    val chg = compact(ev.filter($"ts" >= cut && $"event_type" =!= "error"))
      .withColumn("src", lit(1))
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id", $"event_type").orderBy($"src".desc)
    val expected = base.unionByName(chg)
      .withColumn("pick", row_number().over(pw)).filter($"pick" === 1)
      .filter(!($"src" === 1 && pmod($"event_id", lit(7L)) === 0))
      .select($"user_id", $"event_type", $"event_id", $"value")
    val got = m.select($"user_id", $"event_type", $"event_id", $"value")
    assert(got.exceptAll(expected).count() === 0 && expected.exceptAll(got).count() === 0)
    // the shaped fixture exercises every branch at every sf: error keys
    // carry (immutable in the feed), signup keys insert (absent from the
    // snapshot), the rest update, ~1/7 delete
    val acts = m.groupBy($"action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acts.getOrElse("carry", 0L) > 0 && acts.getOrElse("update", 0L) > 0
      && acts.getOrElse("insert", 0L) > 0, s"degenerate fixture: $acts")
    assert(m.filter($"event_type" === "error" && $"action" =!= "carry").count() === 0)
    assert(m.filter($"event_type" === "signup" && $"action" =!= "insert").count() === 0)
    val deletes = chg.filter(pmod($"event_id", lit(7L)) === 0).count()
    assert(deletes > 0, "no deletes exercised")
    // every D key removes exactly one key from the key union (a chg-only
    // D inserts nothing and deletes nothing that existed — net zero via
    // its own union contribution), so |result| = |base ∪ chg keys| − |D|
    val keyUnion = base.count() + chg.count() -
      base.join(chg, Seq("user_id", "event_type"), "left_semi").count()
    assert(m.count() === keyUnion - deletes, "size identity violated")
    m.unpersist()
  }

  test("L2g incremental screen: flags are internally consistent and non-degenerate") {
    import spark.implicits._
    val out = graft.llm.Dedup.l2gIncrementalSimhash(spark, "/root/testdata/sf0.01")
    // keep == neither corpus- nor batch-duplicate
    assert(out.filter($"keep" =!= (!$"corpus_dup" && !$"batch_dup")).count() === 0)
    // the first batch occurrence of a signature is never a batch_dup
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"simhash")
    assert(out.withColumn("first", min($"doc_id").over(w))
      .filter($"doc_id" === $"first" && $"batch_dup").count() === 0)
    // the fixture genuinely exercises both duplicate kinds and keeps
    val agg = out.agg(
      sum(when($"corpus_dup", 1L).otherwise(0L)),
      sum(when($"batch_dup", 1L).otherwise(0L)),
      sum(when($"keep", 1L).otherwise(0L))).head()
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0 && agg.getLong(2) > 0)
  }

  test("DQ2 profile drift: every metric and drift flag recomputes from first principles") {
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .select($"ts", $"user_id", $"value", $"event_type").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val cut = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    def side(s: Int) = rows.filter(r => (r._1.before(cut)) == (s == 1))
    def m(s: Int): Map[(String, String), Double] = {
      val v = side(s)
      Map(
        ("user_id", "nulls") -> 0.0, ("user_id", "distinct") -> v.map(_._2).distinct.size.toDouble,
        ("user_id", "min") -> v.map(_._2).min.toDouble, ("user_id", "max") -> v.map(_._2).max.toDouble,
        ("value", "nulls") -> 0.0, ("value", "distinct") -> v.map(_._3).distinct.size.toDouble,
        ("value", "min") -> v.map(_._3).min, ("value", "max") -> v.map(_._3).max,
        ("event_type", "nulls") -> 0.0, ("event_type", "distinct") -> v.map(_._4).distinct.size.toDouble)
    }
    val (m1, m2) = (m(1), m(2))
    val expected = m1.keys.toSeq.sortBy(identity).map { k =>
      val (v1, v2) = (m1(k), m2(k))
      val drifted = if (v1 == 0.0) v2 != 0.0 else math.abs(v2 - v1) * 10.0 > math.abs(v1)
      (k._1, k._2, v1, v2, drifted)
    }
    val got = Quality.dq2ProfileDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toSeq
    assert(got === expected)
    assert(side(1).nonEmpty && side(2).nonEmpty, "both snapshots must be non-empty")
  }

  test("U4 snapshot diff: statuses recompute from the id rules; all three occur") {
    import spark.implicits._
    val got = Quality.u4SnapshotDiff(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    // first principles: replay the deterministic two-version derivation
    // on the raw ids — membership and the edit rule decide everything,
    // and unchanged docs must be absent from the manifest
    val ids = Tables.documents(spark, sfDir)
      .select($"doc_id").collect().map(_.getLong(0)).sorted
    val expected = ids.flatMap { id =>
      val inV1 = id % 17 != 3
      val inV2 = id % 19 != 5
      val edited = id % 13 == 2
      (inV1, inV2) match {
        case (false, true) => Some(id -> "added")
        case (true, false) => Some(id -> "removed")
        case (true, true) if edited => Some(id -> "changed")
        case _ => None
      }
    }.toSeq
    assert(got === expected)
    assert(Set("added", "removed", "changed").subsetOf(got.map(_._2).toSet))
  }

  test("U4 fused single-scan diff equals the general two-table join form; plan has no join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // materialize the two derived versions as if they were independent
    // snapshots, run the general manifest-join diff, and pin row
    // equality with the fused form the u4 query ships
    val docs = Tables.documents(spark, sfDir)
    val v1 = docs.filter(pmod($"doc_id", lit(17L)) =!= 3).select($"doc_id", $"text")
    val v2 = docs.filter(pmod($"doc_id", lit(19L)) =!= 5)
      .select($"doc_id",
        when(pmod($"doc_id", lit(13L)) === 2, concat($"text", lit(" [rev2]")))
          .otherwise($"text").as("text"))
    val general = graft.operators.Quality.snapshotDiffTables(v1, v2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val fused = graft.operators.Quality.u4SnapshotDiff(spark, sfDir)
    val got = fused.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === general)
    // the fused plan is the point: one scan, no join, no exchange
    // before the output sort (the r13 4-stage floor removed)
    val full = fused.queryExecution.executedPlan.toString
    val p = full.indexOf("== Initial Plan ==") match { // AQE prints both
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(!p.contains("Join"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") === 1, p)
  }
}
