package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.embed.Featurizer
import graft.functions.VectorFunctions._

/** Named queries for the non-SQL-expressible UDF surfaces: the text
  * featurizer (F1 — the reference's sentence-transformer encode step,
  * `FAISS/PlainDemo/pipeline.py:62,313`) and the multimodal decode stub.
  * Driver check is rows-only; numeric invariants (norm≈1, determinism,
  * batch-shape equivalence) live in ScalaTest specs.
  */
object EmbedQueries {

  /** Embed every document with the batched mapPartitions featurizer —
    * the C1 ingest path: text → ARRAY<FLOAT>(64), L2-normalized.
    */
  def embedDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    Featurizer.embedBatched(docs, "text", "emb")
      .select(col("doc_id"), size(col("emb")).cast("long").as("dim"),
        micro(norm2(col("emb"))).as("norm_micro"),
        micro(element_at(col("emb"), 1).cast("double")).as("c0_micro"))
      .orderBy(col("doc_id"))
  }

  /** Per-dimension feature statistics over the embedding column — the
    * normalization-stats pass (mean/min/max per coordinate) every feature
    * pipeline runs before training. posexplode fans each vector into
    * (dim, value) pairs map-side; the per-dim aggregation is map-combined
    * into ≤ dim groups, so the shuffle is tiny at any corpus size.
    *
    * Values are fixed-point-projected to micros BEFORE summing, so the sum
    * is pure BIGINT (fold-order-free, oracle-exact) — a double sum's value
    * would depend on partitioning.
    */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), micro(col("v").cast("double")).as("vm"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("sum_micro"),
        min(col("vm")).as("min_micro"), max(col("vm")).as("max_micro"))
      .orderBy(col("dim"))

  /** Multimodal decode path: binary column → batched partition-local decode
    * → typed metadata struct, projected flat.
    */
  def mediaDecode(spark: SparkSession, dir: String): DataFrame = {
    val bin = Multimodal.withBinary(spark, dir)
    Multimodal.decodeMeta(bin, "media")
      .select(col("doc_id"), col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"), col("meta.format").as("format"))
      .orderBy(col("doc_id"))
  }
}
