package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}

/** LSH width parameterization (SURVEY §2.10): candidate volume must stay
  * collision-bound — linear in the planted duplicates, never ~N² — as the
  * corpus doubles, and narrower sign-LSH buckets must cut pair volume
  * monotonically. Fixtures are md5-derived so runs are deterministic.
  */
class LshParamsSpec extends SparkSpecBase {

  /** n pseudo-random 30-word docs over a 400-word vocab, plus one exact
    * near-dup (doc n+i copies doc i) for every tenth doc. */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    val base = spark.range(n).toDF("doc_id")
      .withColumn("text", expr(
        "array_join(transform(sequence(1, 30), j -> concat('w', " +
          "CAST(conv(substr(md5(concat(doc_id, '_', j)), 1, 6), 16, 10) AS BIGINT) % 400)), ' ')"))
    val dups = base.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + n).as("doc_id"), $"text")
    base.union(dups)
  }

  test("minhash-LSH pair volume tracks planted dups linearly as N doubles") {
    val small = Dedup.lshCandidatePairs(corpus(300), 16, 4).count()
    val big = Dedup.lshCandidatePairs(corpus(600), 16, 4).count()
    // 30 planted dup pairs -> 60; random band collisions must stay noise
    assert(small >= 30L, s"missed planted dup pairs: $small < 30")
    assert(small <= 40L, s"random collisions dominate: $small")
    assert(big <= 2 * small + 10, s"pair volume superlinear: $small -> $big")
  }

  test("lshCandidatePairs rejects bands that do not divide numHashes") {
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(corpus(10), 16, 5)
    }
  }

  /** n md5-derived 64-dim vectors plus a planted near-dup for every 5th
    * one: the original nudged per-element by uniform noise of half-width
    * `noise` (out of the ±32768 value range), so a single band matches
    * with probability < 1 — the regime where banding restores recall. */
  private def plantedVecs(n: Int, noise: Int): DataFrame = {
    import spark.implicits._
    val base = spark.range(n).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(0, 63), j -> CAST(" +
          "CAST(conv(substr(md5(concat(vec_id, ':', j)), 1, 4), 16, 10) AS BIGINT) - 32768 AS FLOAT))"))
    val dups = base.filter($"vec_id" % 5 === 0)
      .select(($"vec_id" + n).as("vec_id"), expr(
        "transform(embedding, (x, j) -> CAST(x + " +
          s"CAST(conv(substr(md5(concat(vec_id, '~', j)), 1, 4), 16, 10) AS BIGINT) % ${2 * noise + 1} - $noise AS FLOAT))")
        .as("embedding"))
    base.union(dups)
  }

  test("banded sign-LSH: planted near-dup recall rises with bands, volume stays collision-bound") {
    import spark.implicits._
    val n = 200
    val vecs = plantedVecs(n, 1638) // ~5% of the value range
    val planted = n / 5
    def cand(bands: Int): DataFrame = Similarity.signLshPairs(vecs, 8, bands, -1.0)
    def recall(bands: Int): Long = cand(bands)
      .filter($"vec_a" % 5 === 0 && $"vec_b" === $"vec_a" + n).count()
    val (r1, r2, r4) = (recall(1), recall(2), recall(4))
    assert(r1 <= r2 && r2 <= r4, s"recall not monotone in bands: $r1, $r2, $r4")
    assert(r1 < r4, s"banding added no recall: $r1 -> $r4 of $planted")
    assert(r4 >= planted * 9 / 10, s"4 bands still miss >10%: $r4 of $planted")
    // collision bound: the banded union stays linear in the per-band
    // collision volume and far below all-pairs
    val (v1, v4) = (cand(1).count(), cand(4).count())
    val allPairs = (n + planted).toLong * (n + planted - 1) / 2
    assert(v4 <= 6 * v1 + 50, s"banded volume superlinear in bands: $v1 -> $v4")
    assert(v4 < allPairs / 10, s"banded volume near all-pairs: $v4 of $allPairs")
  }

  test("seeded projections lift recall past the axis-aligned dim/signBits wall") {
    import spark.implicits._
    val n = 200
    // heavy nudge (~half the value range): a full-vector projection
    // concentrates (flip prob per bit ≈ θ/π stays small for light noise),
    // so unlike the axis-aligned test the noise must be large before
    // single-band recall drops below 1 and the climb across band counts —
    // including PAST 8 bands of 8 bits, the 64-dim axis-aligned limit —
    // becomes visible
    val vecs = plantedVecs(n, 16000)
    val planted = n / 5
    def cand(bands: Int): DataFrame =
      Similarity.signLshPairs(vecs, 8, bands, -1.0, seed = 7L)
    def recall(bands: Int): Long = cand(bands)
      .filter($"vec_a" % 5 === 0 && $"vec_b" === $"vec_a" + n).count()
    val (r2, r8, r16) = (recall(2), recall(8), recall(16))
    // 16 bands x 8 bits = 128 projections > 64 dims: the axis-aligned form
    // hard-fails here, the seeded form keeps climbing
    intercept[IllegalArgumentException] { Similarity.signLshPairs(vecs, 8, 16, -1.0) }
    assert(r2 <= r8 && r8 <= r16, s"recall not monotone in bands: $r2, $r8, $r16")
    assert(r8 < r16, s"bands past the dim wall added no recall: $r8 -> $r16 of $planted")
    // volume stays collision-bound: far below all-pairs even at 16 bands
    val allPairs = (n + planted).toLong * (n + planted - 1) / 2
    val v16 = cand(16).count()
    assert(v16 < allPairs / 10, s"banded volume near all-pairs: $v16 of $allPairs")
  }

  test("seeded projections are deterministic across partitionings and calls") {
    import spark.implicits._
    val vecs = plantedVecs(100, 1638)
    def pairs(df: DataFrame): Seq[(Long, Long, Long)] =
      Similarity.signLshPairs(df, 8, 10, -1.0, seed = 42L)
        .select($"vec_a", $"vec_b", $"n_shared_bands").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val p3 = pairs(vecs.repartition(3))
    val p7 = pairs(vecs.repartition(7))
    assert(p3.nonEmpty, "seeded LSH found no pairs at all")
    assert(p3 === p7, "pair set depends on partitioning")
    // and the matrix itself is a pure function of the seed
    val m1 = Similarity.rademacher(42L, 80, 64)
    val m2 = Similarity.rademacher(42L, 80, 64)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.flatten.toSet === Set(-1.0, 1.0))
    // different seeds give a different family (not all-equal matrices)
    val m3 = Similarity.rademacher(43L, 80, 64)
    assert(m1.map(_.toSeq).toSeq !== m3.map(_.toSeq).toSeq)
  }

  test("banded signLshPairs rejects bit-sets wider than the vector") {
    import spark.implicits._
    val vecs = spark.range(4).toDF("vec_id")
      .withColumn("embedding", expr("transform(sequence(0, 15), j -> CAST(j AS FLOAT))"))
    intercept[IllegalArgumentException] {
      Similarity.signLshPairs(vecs, 8, 3, 0.0) // 24 bits > 16 dims
    }
  }

  test("wider sign-LSH signatures cut candidate volume monotonically") {
    import spark.implicits._
    val vecs = spark.range(400).toDF("vec_id")
      .withColumn("embedding", expr(
        "transform(sequence(0, 15), j -> CAST(" +
          "CAST(conv(substr(md5(concat(vec_id, ':', j)), 1, 4), 16, 10) AS BIGINT) - 32768 AS FLOAT))"))
    def pairs(bits: Int): Long = Similarity.signLshPairs(vecs, bits, -1.0).count()
    val (p4, p8, p12) = (pairs(4), pairs(8), pairs(12))
    assert(p4 > p8 && p8 > p12, s"expected monotone decrease: $p4, $p8, $p12")
    assert(p8 < 400L * 399 / 2 / 10, s"8-bit buckets barely below all-pairs: $p8")
  }

  test("l34: pair-mining invariants — labels disjoint from positives, anchors covered, ids in range") {
    import spark.implicits._
    val got = Similarity.l34ContrastivePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pos = got.filter(_._3 == 1L).map(p => (p._1, p._2)).toSet
    val neg = got.filter(_._3 == 0L).map(p => (p._1, p._2)).toSet
    assert(pos.nonEmpty && neg.nonEmpty, "both labels must occur")
    // the positive set IS l3b's pair set
    val l3b = Similarity.l3bLshNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos === l3b)
    // a drawn negative never collides with a known positive in either
    // orientation, never pairs an anchor with itself
    val posNorm = pos.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    neg.foreach { case (a, p) =>
      assert(a != p)
      assert(!posNorm.contains((math.min(a, p), math.max(a, p))),
        s"negative ($a,$p) is a known near-dup")
    }
    // every anchor with a positive drew negatives (K=4 draws survive the
    // rare self/known-positive rejections often enough on this fixture)
    val anchors = pos.map(_._1)
    assert(anchors.subsetOf(neg.map(_._1)), "an anchor lost all its draws")
    // partners land inside the dense id space
    val maxId = Tables.embeddings(spark, sfDir)
      .agg(max($"vec_id")).head().getLong(0)
    neg.foreach { case (_, p) => assert(p >= 0 && p <= maxId) }
  }
}
