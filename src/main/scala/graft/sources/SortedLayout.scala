package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorted, size-bounded parquet layout — the write-side half of data
  * skipping (companion to [[BucketedStore]], which solves join
  * co-location; this solves RANGE-predicate pruning and the small-files
  * problem).
  *
  * The reference re-reads its whole CSV corpus per run
  * (`FAISS/PlainDemo/pipeline.py:268-277`); at 100 TB the dominant cost of
  * every downstream query is how much of the lake a scan can SKIP. Parquet
  * stores per-file and per-row-group min/max statistics, but they only
  * prune when values are clustered: `repartitionByRange` gives disjoint
  * key ranges per output task (equal keys can't straddle files),
  * `sortWithinPartitions` clusters row groups inside each file, and
  * `maxRecordsPerFile` bounds file size so a 1000-executor write can't
  * emit multi-GB stragglers. A range predicate then touches
  * ceil(selectivity × files) files instead of all of them.
  *
  * One shuffle (the range exchange, driven by sampled split points) paid
  * at write time, amortized over every subsequent range scan.
  */
object SortedLayout {

  /** Persist `df` range-clustered by `key`: `numFiles` range partitions,
    * each internally sorted, each split at `maxRecordsPerFile` rows.
    */
  def write(df: DataFrame, path: String, key: String, numFiles: Int = 8,
            maxRecordsPerFile: Long = 1000000L): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Per-file (min, max, rows) of `key` — the clustering audit: a sorted
    * layout has pairwise-disjoint file ranges, which is exactly the
    * property parquet min/max pruning needs. Distributed (one agg over the
    * scan, grouped by `input_file_name`); used by the spec.
    */
  def fileRanges(spark: SparkSession, path: String, key: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(key)).as("lo"), max(col(key)).as("hi"),
        count(lit(1)).as("rows"))
      .orderBy(col("lo"))
}
