package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** C6: the collection-catalog surface — `utility.list_collections()` +
  * prefix-filtered `drop_collection` (`Milvus/stream1.py:512-536`, prefix
  * filter at `:530`), on Spark's session catalog: every "collection" is a
  * registered view; listing, filtering and dropping are catalog calls.
  *
  * Catalog metadata is driver-side by nature (a name list, not data), so
  * the `collect()`s here are over ≤ a few names — the data behind each
  * store is never collected.
  */
object CatalogOps {

  private val Prefix = "graft_cat_"

  /** Named query: create three stores under the namespace, drop those
    * matching the victim prefix (the reference's drop-all loop), return the
    * surviving catalog listing with row counts (`collection.num_entities`
    * per survivor). Idempotent: re-running from any prior state yields the
    * same result.
    */
  def catalogQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // reset our namespace from any previous execution in this session
    listStores(spark, Prefix).foreach(spark.catalog.dropTempView)
    val e = Tables.embeddings(spark, dir)
    e.filter(col("vec_id") < 10).createOrReplaceTempView(Prefix + "tmp_a")
    e.filter(col("vec_id") < 20).createOrReplaceTempView(Prefix + "tmp_b")
    e.filter(col("vec_id") < 10).createOrReplaceTempView(Prefix + "keep_c")
    dropByPrefix(spark, Prefix + "tmp_")
    val survivors = listStores(spark, Prefix).sorted
    survivors.map(n => (n, spark.table(n).count()))
      .toDF("store_name", "n_rows").orderBy("store_name")
  }

  /** `utility.list_collections()` over the session catalog. */
  def listStores(spark: SparkSession, prefix: String): Seq[String] =
    spark.catalog.listTables().collect().toSeq
      .filter(t => t.tableType == "TEMPORARY" && t.name.startsWith(prefix))
      .map(_.name)

  /** The reference's drop-all-matching loop (`stream1.py:528-536`). */
  def dropByPrefix(spark: SparkSession, prefix: String): Int = {
    val victims = listStores(spark, prefix)
    victims.foreach(spark.catalog.dropTempView)
    victims.size
  }
}
