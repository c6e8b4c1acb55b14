package graft.tools

import org.apache.spark.sql.SparkSession
import graft.sources.PqStore
import graft.operators.VectorSearch

/** Dev probe: recall@5 of the PQ ADC search vs the exact search, per sf
  * dir — the measurement behind the recall notes in PqStore's Scaladoc
  * and PqStoreSpec's floor.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    for (sf <- args) {
      val path = PqStore.defaultPath(sf)
      PqStore.ensure(spark, sf, path)
      val nq = 20
      val exact = VectorSearch.knnExact(spark, sf, 5, nq).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val pq = PqStore.search(spark, path, VectorSearch.querySet(spark, sf, nq), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL residual $sf = ${(exact intersect pq).size.toDouble / exact.size}")
      // raw-encoding baseline via a single zero coarse centroid:
      // residual = v − 0 = v, cell term = 0 — exactly the raw scheme
      val rawPath = path + "_rawprobe"
      val zero = spark.range(1).select(lit(0).cast("int").as("cell_id"),
        lit((0 until 64).map(_ => 0.0).toArray).as("centroid"))
      PqStore.writeFrom(spark, rawPath,
        graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding")), zero)
      val raw = PqStore.search(spark, rawPath, VectorSearch.querySet(spark, sf, nq), 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"RECALL raw      $sf = ${(exact intersect raw).size.toDouble / exact.size}")
      graft.streaming.StreamOps.rmTree(new java.io.File(rawPath))
    }
    spark.stop()
  }
}
