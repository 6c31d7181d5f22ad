package graft

import org.apache.spark.sql.functions._

import graft.llm.Assembly

/** Invariants of the corpus-assembly ops (L9 pack, L11 mix) that the
  * oracle's hash check can't state: budget respect, contiguity, rate
  * fidelity, and non-degeneracy (the fixture must actually exercise the
  * boundary — a budget no stratum fills, or uniform strata where every
  * rate is 1.0, would leave the operator green but untested). */
class AssemblySpec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("L9 packs respect the budget modulo one straddler and are contiguous") {
    import spark.implicits._
    val packs = Assembly.l9SequencePack(spark, sf01)
      .groupBy($"source", $"shard", $"pack_id")
      .agg(sum($"tokens").as("pack_tokens"), max($"tokens").as("max_doc"),
        count(lit(1)).as("n_docs"))
    // exclusive running total => a pack exceeds the budget only by its
    // final (straddling) document
    assert(packs.filter($"pack_tokens" - $"max_doc" >= Assembly.PACK_BUDGET).count() === 0)
    // pack ids per stratum are 0..max with no gaps (floor of a running sum
    // is monotone; a gap would mean a pack the scan never opened)
    val gaps = packs.groupBy($"source", $"shard")
      .agg(max($"pack_id").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n" - 1)
    assert(gaps.count() === 0)
    // non-degenerate at the correctness SF: multiple packs exist
    assert(packs.filter($"pack_id" > 0).count() > 0)
  }

  test("L11 keeps the smallest stratum whole and tracks rates elsewhere") {
    import spark.implicits._
    val kept = Assembly.l11SourceMix(spark, sf01)
    val total = Tables.documents(spark, sf01).groupBy($"lang").count()
    val byLang = kept.groupBy($"lang")
      .agg(count(lit(1)).as("n_kept"), first($"n_lang").as("n_lang"),
        first($"rate").as("rate"))
      .join(total, "lang")
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_lang"),
          r.getAs[Double]("rate"), r.getAs[Long]("count"))).toMap
    // counts the operator reports equal the corpus truth
    byLang.foreach { case (_, (_, nLang, _, truth)) => assert(nLang === truth) }
    // the smallest stratum has rate 1.0 and keeps everything
    val (minLang, (minKept, minN, minRate, _)) = byLang.minBy(_._2._2)
    assert(minRate === 1.0)
    assert(minKept === minN)
    // non-degenerate: at least one stratum is genuinely downsampled, and
    // its realized keep fraction tracks the rate (md5 buckets are uniform;
    // binomial 3-sigma at the fixture sizes is ~0.1)
    val down = byLang.filter(_._2._3 < 1.0)
    assert(down.nonEmpty)
    down.foreach { case (_, (nKept, nLang, rate, _)) =>
      assert(math.abs(nKept.toDouble / nLang - rate) < 0.15)
    }
    // determinism: a second evaluation selects the identical doc set
    val again = Assembly.l11SourceMix(spark, sf01)
    assert(kept.select("doc_id").except(again.select("doc_id")).count() === 0)
    assert(again.select("doc_id").except(kept.select("doc_id")).count() === 0)
  }

  test("L13 export honors every stage's contract end to end") {
    import spark.implicits._
    val out = Assembly.l13CorpusExport(spark, sf01).cache()
    val docs = Tables.documents(spark, sf01)
    val exported = out.select($"doc_id")
    // stage 1+corpus split: no benchmark doc ships, every exported doc
    // clears the quality gate (re-derive the gate independently)
    assert(out.filter($"doc_id" < 50).count() === 0)
    val gate = docs.withColumn("w", split($"text", " "))
      .filter(size(array_distinct($"w")).cast("double") / size($"w")
        < Assembly.EXPORT_MIN_QUALITY)
    assert(exported.join(gate, "doc_id").count() === 0)
    // stage 2: no two exported docs share a text
    val texts = docs.join(exported, "doc_id").groupBy($"text").count()
    assert(texts.filter($"count" > 1).count() === 0)
    // stage 3: no exported doc shares a 5-gram with the bench set —
    // re-derived with the INDEPENDENT shingle path (Dedup.explodedShingles
    // string form), not the md5p48 expression the operator used
    val benchSh = graft.llm.Dedup.shingleStrings(docs.filter($"doc_id" < 50))
      .select($"shingle").distinct()
    val hit = graft.llm.Dedup.shingleStrings(docs.join(exported, "doc_id"))
      .join(benchSh, "shingle")
    assert(hit.count() === 0)
    // stage 5: budget respected modulo the straddler, within each stratum
    val packs = out.groupBy($"source", $"shard", $"pack_id")
      .agg(sum($"tokens").as("t"), max($"tokens").as("mx"))
    assert(packs.filter($"t" - $"mx" >= Assembly.PACK_BUDGET).count() === 0)
    // the fixture genuinely exercises the pipeline: every stage drops rows
    val n = out.count()
    assert(n > 0 && n < docs.filter($"doc_id" >= 50).count())
    out.unpersist()
  }
}
