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

  /** [[writeKeys]] with an explicit location — creates an EXTERNAL bucketed
    * table, so the bucketed files outlive the catalog entry. With the
    * default in-memory catalog the entry dies with the JVM while the
    * shuffle paid at write time is durable on disk; callers re-attach via
    * [[registerKeys]] instead of re-running the CTAS.
    */
  def writeKeysAt(df: DataFrame, table: String, keys: Seq[String],
                  path: String, buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet").saveAsTable(table)

  /** Re-attach a catalog entry over an existing bucketed directory (the
    * cross-JVM half of [[writeKeysAt]]): schema is read from the parquet
    * footers, the bucket spec is re-declared, and Spark's scan resumes
    * recognizing the files' bucket-id suffixes — the co-located-join
    * property survives a JVM restart without rewriting a byte.
    */
  def registerKeys(spark: SparkSession, table: String, keys: Seq[String],
                   path: String, buckets: Int = 8): Unit = {
    val schemaDdl = spark.read.parquet(path).schema.toDDL
    val keyList = keys.mkString(", ")
    spark.sql(
      s"""CREATE TABLE $table ($schemaDdl)
         |USING parquet
         |CLUSTERED BY ($keyList) SORTED BY ($keyList) INTO $buckets BUCKETS
         |LOCATION '${new java.io.File(path).toURI}'""".stripMargin)
  }

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

  /** Drop the table AND its files. [[writeKeysAt]] tables are external —
    * a bare `DROP TABLE` leaves their directory behind by design (that is
    * what cross-JVM re-registration reuses), so the explicit delete
    * helper removes the local directory too.
    */
  def drop(spark: SparkSession, table: String): Unit = {
    val loc =
      try {
        if (spark.catalog.tableExists(table))
          Some(spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    loc.filter(u => u.getScheme == null || u.getScheme == "file").foreach(u =>
      graft.streaming.StreamOps.rmTree(new java.io.File(u.getPath)))
  }
}
