package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located join layout: bucketed tables (SURVEY.md §1.2 "table-name
  * suffixing / catalog namespacing" meets the 100 TB join problem).
  *
  * The reference's per-model collections (`Milvus/stream1.py:96-98`) are
  * repeatedly joined/looked-up by PK. At lake scale, a big-big equi-join
  * (store ⋈ fresh batch, hits ⋈ documents) re-shuffles BOTH sides on every
  * query unless the layout already agrees with the join key. `bucketBy`
  * materializes the hash partitioning into the table: Catalyst sees
  * matching `HashPartitioning` on both sides and plans the join with NO
  * Exchange — the shuffle is paid once at write time, amortized over every
  * subsequent join (asserted in BucketedStoreSpec).
  *
  * `sortBy` on the same key additionally pre-sorts bucket files, removing
  * the per-query Sort under SortMergeJoin.
  */
object BucketedStore {

  /** Persist `df` bucketed (and sorted) by `key` as a catalog table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    writeKeys(df, table, Seq(key), buckets)

  /** Multi-column bucket key: the co-located-join contract requires the
    * join keys to cover the FULL bucket spec, so composite join keys
    * (e.g. the (band, bk) LSH probe key) bucket on all columns together.
    */
  def writeKeys(df: DataFrame, table: String, keys: Seq[String], buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Append to an existing bucketed table with the SAME bucket spec — the
    * day-2 ingest path: new rows land in their hash buckets (each append
    * writes its own bucket files; readers union them per bucket), so the
    * zero-Exchange co-located-join property survives the append.
    */
  def appendKeys(df: DataFrame, table: String, keys: Seq[String], buckets: Int = 8): Unit =
    df.write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet").saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
