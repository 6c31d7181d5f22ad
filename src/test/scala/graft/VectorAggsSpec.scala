package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAggs

class VectorAggsSpec extends SparkSpecBase {

  test("VecMean centroids agree with the posexplode path within fp tolerance") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val viaUdaf = emb.groupBy($"label")
      .agg(VectorAggs.vecMean($"embedding").as("centroid"))
      .collect().map(r => r.getAs[Int]("label") -> r.getSeq[Double](1)).toMap
    val viaExplode = emb
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((sum($"v".cast("double")) / count(lit(1))).as("c"))
      .groupBy($"label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("centroid"))
      .collect().map(r => r.getAs[Int]("label") -> r.getSeq[Double](1)).toMap
    assert(viaUdaf.keySet === viaExplode.keySet)
    for (k <- viaUdaf.keySet) {
      val (a, b) = (viaUdaf(k), viaExplode(k))
      assert(a.size === b.size)
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("VecMean skips null and empty vectors (AVG(NULL) semantics)") {
    import spark.implicits._
    val rows = Seq(
      (0, Array(1.0f, 3.0f)),
      (0, null.asInstanceOf[Array[Float]]),
      (0, Array.empty[Float]),
      (0, Array(3.0f, 5.0f)),
      (1, null.asInstanceOf[Array[Float]]),
      (1, Array.empty[Float]),
    ).toDF("label", "embedding")
    val out = rows.groupBy($"label")
      .agg(VectorAggs.vecMean($"embedding").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // null/empty contribute to neither sum nor count: mean of the 2 real rows
    assert(out(0) === Seq(2.0, 4.0))
    // a group of only null/empty vectors yields an empty mean, not a crash
    assert(out(1).isEmpty)
  }

  test("VecMean is partitioning-invariant (merge correctness)") {
    import spark.implicits._
    def centroids(parts: Int): Map[Int, Seq[Double]] =
      Tables.embeddings(spark, sfDir).repartition(parts).groupBy($"label")
        .agg(VectorAggs.vecMean($"embedding").as("c"))
        .collect().map(r => r.getAs[Int]("label") -> r.getSeq[Double](1)).toMap
    val a = centroids(1); val b = centroids(13)
    for (k <- a.keySet)
      a(k).zip(b(k)).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }
}
