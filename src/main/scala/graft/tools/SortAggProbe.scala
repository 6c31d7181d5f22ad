package graft.tools

import org.apache.spark.sql.DataFrame

/** Round-13 probe: does `spark.sql.execution.replaceHashWithSortAgg`
  * (off by default) convert q2_bucketed's 75M-group hash aggregate into
  * a streaming sort aggregate over the already-sorted zero-exchange SMJ
  * output — and is that faster? Measurement harness only. */
object SortAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/bench_star/sf25")
    val spark = MakeHeavy.session(Some(s"$dir/warehouse"))
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    MakeHeavy.registerBucketed(spark, dir,
      Seq(("hv_orders_b", "o_orderkey"), ("hv_lineitem_b", "l_orderkey")))
    def q2(): DataFrame = graft.operators.Analytics.q2From(spark,
      spark.read.parquet(s"$dir/customer.parquet"),
      spark.table("hv_orders_b"), spark.table("hv_lineitem_b").hint("merge"))
    for (mode <- Seq("false", "true", "false", "true")) {
      spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", mode)
      graft.BenchUtil.force(q2()) // warmup per mode
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchUtil.force(q2())
        (System.nanoTime() - t0) / 1e9
      }
      val plan = q2().queryExecution.executedPlan.toString
      val agg = if (plan.contains("SortAggregate")) "SortAggregate" else "HashAggregate"
      println(f"SORTAGG mode=$mode agg=$agg median=${graft.BenchUtil.median(ts.toVector)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
