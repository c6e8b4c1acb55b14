package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

/** The persisted form of the IVF "index" (SURVEY.md §1.2): a clustered
  * parquet layout `partitionBy(cell_id)` plus a tiny centroid table.
  *
  * This is what "vector index" means on a lake at 100 TB: not a mutable
  * in-memory structure (`index.add`, `FAISS/PlainDemo/pipeline.py:321`) but
  * a partitioned materialization whose directory layout IS the coarse
  * quantizer — a probed query equi-joins on `cell_id` and the scan planner
  * prunes to nprobe/nlist of the files (`PartitionFilters` in the plan),
  * the same data-skipping FAISS gets from its inverted lists.
  */
object IndexStore {

  /** Build and persist the clustered index: rows under
    * `path/rows/cell_id=*` and centroids under `path/centroids`.
    */
  def write(spark: SparkSession, dir: String, path: String): Unit = {
    val (assigned, centroids) = VectorSearch.ivfBuild(spark, dir)
    assigned.write.mode("overwrite")
      .partitionBy("cell_id")
      .parquet(s"$path/rows")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Open the clustered index. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/rows"),
      spark.read.parquet(s"$path/centroids"))

  /** Probed search against the PERSISTED index: identical query shape to
    * VectorSearch.ivfSearch, but the equi-join key is now also the storage
    * partition key, so the parquet source prunes unprobed cells' files
    * before reading a byte.
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             k: Int = 5, nprobe: Int = 10): DataFrame = {
    val (rows, centroids) = read(spark, path)
    VectorSearch.ivfSearch(rows, centroids, queries, k, nprobe)
  }
}
