package graft

import org.apache.spark.sql.functions._

/** Product quantization (l3l/l3m): the codebook recomputed from plain
  * Scala (same integer fixed-point Lloyd iterations), ADC sanity, and
  * partitioning invariance — the engine-determinism claims the DuckDB
  * hash compare asserts once, restated as first principles. */
class PqSpec extends SparkSpecBase {

  private val S = graft.llm.Similarity

  /** The reference trainer: identical rules, no Spark — init from
    * vec_id < K, exact BIGINT distances with lowest-id tie-break,
    * trunc(double(sum)/count) centroid update, empty cluster keeps its
    * previous centroid. */
  private def refTrain(vecs: Map[Long, Array[Long]]): Map[(Int, Int, Int), Long] = {
    val m = 64 / S.PQ_SUB
    var cent: Map[(Int, Int, Int), Long] =
      (for (c <- 0 until S.PQ_K; mm <- 0 until m; d <- 0 until S.PQ_SUB)
        yield (mm, c, d) -> vecs(c.toLong)(mm * S.PQ_SUB + d)).toMap
    for (_ <- 1 to S.PQ_ITERS) {
      val assign = for ((id, q) <- vecs.toSeq; mm <- 0 until m) yield {
        val best = (0 until S.PQ_K).map { c =>
          val dist = (0 until S.PQ_SUB).map { d =>
            val diff = q(mm * S.PQ_SUB + d) - cent((mm, c, d)); diff * diff
          }.sum
          (dist, c)
        }.min
        (id, mm, best._2)
      }
      val upd = assign.groupBy { case (_, mm, c) => (mm, c) }.flatMap {
        case ((mm, c), members) =>
          (0 until S.PQ_SUB).map { d =>
            val vals = members.map { case (id, _, _) => vecs(id)(mm * S.PQ_SUB + d) }
            (mm, c, d) -> (vals.sum.toDouble / vals.size).toLong
          }
      }
      cent = cent.map { case (k, old) => k -> upd.getOrElse(k, old) }
    }
    cent
  }

  test("l3l: codebook equals the plain-Scala integer Lloyd reference") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => (x.toDouble * S.PQ_SCALE).toLong).toArray)
      .toMap
    val want = refTrain(vecs)
    val got = S.l3lPqTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(got === want)
    // the training moved the codebook off its init (k-means actually ran)
    val moved = want.count { case ((mm, c, d), v) =>
      v != vecs(c.toLong)(mm * S.PQ_SUB + d)
    }
    assert(moved > want.size / 2, s"only $moved centroids moved off init")
  }

  test("single-plan Lloyd chain == collect-per-iteration training, bit for bit") {
    // r15: the declared l3l runs the whole fixpoint as ONE compiled plan
    // (pqTrainPlan — no per-iteration collect/job boundary); the memo
    // builder keeps the collecting pqTrain. Same rules, same bits.
    val plan = S.pqTrainPlan(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(plan === S.pqTrain(spark, sfDir).toSet)
  }

  test("codebook memo replay is bit-equal to inline training (the l3m/l3n serve path)") {
    // r14: the declared l3m/l3n read the fingerprint-stamped pq_codebook
    // instead of re-running Lloyd per evaluation — the replay must be the
    // SAME driver state the training produces (ints/longs round-trip
    // parquet exactly), and a second ensure must be a pure read (fresh
    // stamp), not a retrain
    val inline = S.pqTrain(spark, sfDir).toSet
    val first = graft.llm.AnnIndex.ensurePqCodebook(spark, sfDir).toSet
    val again = graft.llm.AnnIndex.ensurePqCodebook(spark, sfDir).toSet
    assert(first === inline)
    assert(again === inline)
  }

  test("l3m: ADC ranks the query's own vector first; distances are sane") {
    import spark.implicits._
    val r = S.l3mPqTopk(spark, sfDir).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toSeq
    assert(r.size === 10)
    // the query's own quantization error is the smallest ADC distance on
    // this fixture (near-isotropic vectors, coarse 4-bit codes)
    assert(r.head._1 === S.PQ_QUERY_ID)
    assert(r.forall(_._2 >= 0L))
    assert(r.map(_._2) === r.map(_._2).sorted)
  }

  test("l3n: IVF-PQ equals the full ADC ranking restricted to the probed lists") {
    import spark.implicits._
    val got = S.l3nIvfPqTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got.size === 10)
    // exactly IVFPQ_PROBE distinct lists can appear in the result
    val lists = got.map(_._2).distinct
    assert(lists.size <= S.IVFPQ_PROBE && lists.nonEmpty)
    // the composite is the l3m ADC arithmetic restricted to member
    // vectors: every returned (vec_id, adc_dist) must agree with a full
    // ADC pass filtered to the probed lists and re-ranked
    val members = Tables.embeddings(spark, sfDir)
      .filter($"label".isin(lists: _*) && $"vec_id" =!= S.PQ_QUERY_ID)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => members.contains(r._1)))
    val fullAdc = S.l3mPqTopk(spark, sfDir) // top-10 of the UNRESTRICTED scan
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // where the unrestricted top-10 and the probed set overlap, the
    // distances must be identical (same codes, same codebook, same query)
    got.foreach { case (id, _, dist) =>
      fullAdc.get(id).foreach(d => assert(d === dist, s"ADC mismatch for vec $id"))
    }
    assert(got.map(_._3) === got.map(_._3).sorted)
  }

  test("pq codebook and top-k are partitioning-invariant") {
    def table(): Seq[String] =
      S.l3lPqTrain(spark, sfDir).collect().map(_.toString).toSeq
    def topk(): Seq[String] =
      S.l3mPqTopk(spark, sfDir).collect().map(_.toString).toSeq
    val (a, b) = (table(), topk())
    val touched = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try {
      assert(a === table())
      assert(b === topk())
    } finally spark.conf.set("spark.sql.shuffle.partitions", touched)
  }
}
