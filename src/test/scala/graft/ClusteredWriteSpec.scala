package graft

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** The clustered layout's scale claim, machine-checked: after
  * `Etl.clusteredWrite` each output file covers a DISJOINT slice of the
  * cluster column and every row group carries min/max footer stats — the
  * two properties a reader needs to prune row groups on a cluster-column
  * predicate without any index. */
class ClusteredWriteSpec extends SparkSpecBase {

  test("clustered write yields disjoint per-file ranges with row-group stats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = spark.conf.get("spark.graft.scratchDir",
      "/root/repo/target/graft-tmp") + "/clustered_spec"
    graft.operators.Etl.clusteredWrite(
      Tables.orders(spark, sfDir).withColumn("o_date", to_date($"o_orderdate")),
      out, files = 6, clusterCol = "o_date")

    val conf = spark.sparkContext.hadoopConfiguration
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length > 1, "need several files to prove disjointness")

    // per-file [min, max] of o_date (DATE = INT32 days) from the footers
    val ranges = files.flatMap { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        assert(blocks.nonEmpty, s"${f.getName}: no row groups")
        val stats = blocks.map { b =>
          val col = b.getColumns.asScala
            .find(_.getPath.toDotString == "o_date")
            .getOrElse(fail(s"${f.getName}: no o_date column chunk"))
          val s = col.getStatistics
          assert(s != null && s.hasNonNullValue,
            s"${f.getName}: row group without o_date min/max stats — skipping impossible")
          (s.genericGetMin.asInstanceOf[Number].intValue(),
            s.genericGetMax.asInstanceOf[Number].intValue())
        }
        if (stats.isEmpty) None
        else Some((stats.map(_._1).min, stats.map(_._2).max))
      } finally reader.close()
    }
    // disjoint: sorted by min, no file's range reaches into the next one's
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, prevMax), (curMin, _)) =>
        assert(curMin > prevMax,
          s"file ranges overlap: [..,$prevMax] then [$curMin,..] — range partitioning broken")
      case _ =>
    }
  }
}
