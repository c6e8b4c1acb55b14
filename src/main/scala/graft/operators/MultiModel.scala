package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.embed.Featurizer
import graft.functions.VectorFunctions._

/** S6: the multi-model sweep + combined metrics sink — the reference's core
  * loop (`FAISS/PlainDemo/pipeline.py:290-298`: run the full workload once
  * per embedding model; `:357-400`: union every model's records into ONE
  * long-format metrics table).
  *
  * The "models" here are 7 hashing featurizers mirroring the reference's 7
  * sentence-transformer checkpoints (`pipeline.py:290-298`) — same count,
  * same output-dimension spread (300/384/768), and each salted by its name
  * so same-dim models still define DISTINCT vector spaces. Each model's
  * workload genuinely executes: the corpus is embedded in that model's
  * space and an exact top-k search runs in it; the combined table is the
  * `unionByName` of per-model metric rows.
  *
  * Scale shape: the per-model pipelines are independent DataFrame branches
  * of one plan — on a cluster they schedule concurrently, and nothing is
  * collected to the driver.
  */
object MultiModel {

  /** The sweep's model list: name → output dimension, one per reference
    * checkpoint (`pipeline.py:290-298`), dims matching each model's real
    * embedding width.
    */
  val models: Seq[(String, Int)] = Seq(
    ("paraphrase_minilm_l12", 384),
    ("all_minilm_l6", 384),
    ("distilbert_nli_stsb", 768),
    ("codebert_base", 768),
    ("bert_base_nli", 768),
    ("komninos_word_avg", 300),
    ("all_mpnet_base", 768))

  private def metricRow(df: DataFrame, model: String, op: String, dim: Int): DataFrame =
    df.agg(count(lit(1)).as("n_rows"))
      .select(lit(model).as("model"), lit(op).as("op"),
        col("n_rows"), lit(dim.toLong).as("dim"))

  /** One model's workload: embed the corpus, then exact top-k search for
    * the first `nq` docs in that model's space. Returns the two metric rows
    * (`op = embed | search`) the combined sink unions.
    */
  def modelMetrics(spark: SparkSession, dir: String, model: String, dim: Int,
                   nq: Int = 3, k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // ONE full-corpus embed per model (the search base). The query side
    // filters FIRST and embeds nq rows (embedBatched is opaque to Catalyst,
    // so the predicate must be applied before the mapPartitions by hand),
    // and the embed-count row counts docs — embedding is 1:1 row-preserving
    // by construction, so the count is identical without a third embed pass.
    val embedded = Featurizer.embedBatched(docs, "text", "embedding", dim, salt = model)
    val q = Featurizer.embedBatched(docs.filter(col("doc_id") < nq), "text", "qvec", dim, salt = model)
      .select(col("doc_id").as("qid"), col("qvec"))
    val scored = embedded.crossJoin(broadcast(q))
      .filter(col("doc_id") =!= col("qid"))
      .withColumn("sim", dot(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("doc_id"))
    val hits = scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
    metricRow(docs, model, "embed", dim)
      .unionByName(metricRow(hits, model, "search", dim))
  }

  /** The combined multi-model metrics table (`pipeline.py:357-400`):
    * long format (model, op, n_rows, dim), one `unionByName` across models.
    */
  def combinedMetrics(spark: SparkSession, dir: String): DataFrame =
    models.map { case (name, dim) => modelMetrics(spark, dir, name, dim) }
      .reduce(_ unionByName _)
      .orderBy(col("model"), col("op"))
}
