package graft.tools
import org.apache.spark.sql.functions._
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = MakeHeavy.session()
    import spark.implicits._
    val dir = "/root/repo/target/bench_heavy/sf5"
    val emb = graft.Tables.embeddings(spark, dir)
    val n = emb.count()
    val sized = math.max(8, math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt)
    println(s"PROBE n=$n sizedBits=$sized")
    graft.plans.RademacherSigs.register(spark)
    val seed = graft.llm.Similarity.L3G_SEED
    // candidate pairs (pre-cosine): the banded self-join + dedup
    val withSigs = emb.withColumn("rsigs", expr(s"rademacher_sigs(embedding, ${seed}L, $sized, 12)"))
    val exploded = withSigs.select($"vec_id", posexplode($"rsigs").as(Seq("band", "bucket")))
    val a = exploded.as("a"); val b = exploded.hint("merge").as("b")
    val cand = a.join(b, $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .groupBy($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b")).agg(count(lit(1)).as("nsb"))
    val nc = cand.count()
    println(s"PROBE candidates=$nc")
    val out = graft.llm.Similarity.signLshPairs(emb, sized, 12, 0.2, seed).count()
    println(s"PROBE survivors=$out  frac=${out.toDouble/nc}")
    // cosine distribution of candidates: how sharp is the cut?
    // 64-bit wide sig for hamming estimate
    val wide = emb.select($"vec_id", expr(s"rademacher_sigs(embedding, ${seed+1}L, 62, 1)[0]").as("w"))
    val withW = cand
      .join(broadcast(wide.select($"vec_id".as("vec_a"), $"w".as("w_a"))), "vec_a")
      .join(broadcast(wide.select($"vec_id".as("vec_b"), $"w".as("w_b"))), "vec_b")
      .withColumn("ham", expr("bit_count(w_a ^ w_b)"))
    val hist = withW.groupBy($"ham").count().orderBy($"ham").collect()
    println("PROBE ham_hist " + hist.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    spark.stop()
  }
}
