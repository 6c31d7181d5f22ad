package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.11 #3): the one custom-aggregate
  * pattern the engine reserves — element-wise vector aggregation with
  * map-side partial merge, used to build IVF centroids in a single pass
  * over the embeddings instead of posexplode + per-dimension rows.
  *
  * Buffers are dense double arrays; `merge` is associative and
  * commutative, so Spark's partial aggregation (combine on the map side,
  * final on the reduce side) applies — at 100 TB each executor ships one
  * 64-double buffer per group, not its rows.
  */
object VectorAggs {

  /** Element-wise sum of float vectors (+ count), yielding the mean.
    *
    * Null and zero-length vectors are SKIPPED (SQL `AVG(NULL)` semantics):
    * they contribute neither to the sum nor to the count, so a group of
    * only null/empty vectors yields an empty mean. This also keeps the
    * buffer invariant `count > 0 ⇒ sums nonEmpty` that `merge` relies on. */
  object VecMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

    override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
      if (a == null || a.isEmpty) return b
      val acc = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      require(a.length == acc.length,
        s"VecMean: ragged input - expected dim ${acc.length}, got ${a.length}")
      var i = 0
      while (i < a.length) { acc(i) += a(i); i += 1 }
      (acc, b._2 + 1)
    }

    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        require(x._1.length == y._1.length,
          s"VecMean: merge of mismatched dims ${x._1.length} vs ${y._1.length}")
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    }

    override def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) Array.empty else r._1.map(_ / r._2)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** Column form: `df.groupBy(k).agg(vecMean(col("embedding")))`. */
  def vecMean(col: Column): Column = udaf(VecMean).apply(col)
}
