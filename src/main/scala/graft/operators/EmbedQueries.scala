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

  /** Upper-triangle Gram matrix Σ xᵢ·xⱼ over the embedding column — the
    * distributed linear-algebra primitive under covariance estimation,
    * whitening, and anisotropy diagnosis (is the embedding space
    * collapsing onto a few directions? — the post-hoc check every
    * embedding pipeline runs). One pass, NO pairwise row work: each row
    * emits its d(d+1)/2 products map-side (a literal array of struct
    * terms — pure codegen, no UDF/UDAF), and the aggregate map-combines
    * into ≤ d(d+1)/2 groups, so the shuffle carries partitions × 136
    * buffers at ANY corpus size — the same treeAggregate shape as the
    * k-means centroid update.
    *
    * Terms are fixed-point-projected to micros BEFORE summing (the
    * [[dimStats]] rule): the sum is pure BIGINT, fold-order-free, so the
    * oracle replays it exactly; a double sum's low bits would depend on
    * partitioning. dims=16 bounds the registered query's oracle cost;
    * the spec runs the full 64.
    */
  def gramMatrix(spark: SparkSession, dir: String, dims: Int = 16): DataFrame =
    Tables.embeddings(spark, dir)
      // carry only the prefix the matrix reads, then fan out (i, j ≥ i)
      // with two nested generators — each a tiny codegen'd Generate (a
      // single literal array of d(d+1)/2 struct terms compiles into a
      // >64KB Janino method and silently drops the stage to interpreted
      // fallback; the nested-explode form stays inside whole-stage codegen)
      .select(slice(col("embedding"), 1, dims).as("e"))
      .select(col("e"), explode(sequence(lit(0), lit(dims - 1))).as("i"))
      .select(col("e"), col("i"), explode(sequence(col("i"), lit(dims - 1))).as("j"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        floor(element_at(col("e"), col("i") + 1).cast("double") *
          element_at(col("e"), col("j") + 1).cast("double") * lit(1000000.0))
          .cast("long").as("t"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("gram_sum_micro"))
      .orderBy(col("i"), col("j"))

  /** Dominant eigenvector of the Gram matrix by power iteration — the
    * embedding-collapse audit: if the top eigenvalue's share of the trace
    * is large, the embedding space has collapsed onto one direction and
    * cosine similarity is mostly measuring that direction (the anisotropy
    * problem every embedding-quality writeup warns about). The heavy,
    * distributed step is [[gramMatrix]] (one corpus pass); the iteration
    * itself runs on the d×d micro-integer matrix — matvec as an equi-join
    * + map-combined sum, so each round shuffles ≤ d² rows regardless of
    * corpus size (the pagerank shape).
    *
    * Arithmetic contract: the matrix entries are the micro-floored BIGINT
    * Gram sums, the vector is re-quantized to ~milli scale each round by
    * MAX-norm floor division — `(u − pmod(u, m)) DIV m` is exact for every
    * sign (the numerator is an exact multiple, so truncating DIV equals
    * floor division), keeping all five rounds pure integer and the DuckDB
    * unrolled-CTE replay bit-identical; no double ever crosses a sum.
    * λ falls out of the last normalization (max|G·v| with ‖v‖∞ ≈ 1000).
    */
  def topEigen(spark: SparkSession, dir: String, dims: Int = 16,
               rounds: Int = 5): DataFrame = {
    val g = gramMatrix(spark, dir, dims)
      .select(col("i"), col("j"), col("gram_sum_micro").as("w"))
    val edges = g.unionByName(
        g.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("w")))
      .localCheckpoint() // one corpus pass; every round re-reads d² rows
    var v = spark.range(dims).select(col("id").as("j"), lit(1000L).as("v"))
    for (_ <- 1 to rounds) {
      val u = edges.join(v, "j").groupBy(col("i"))
        .agg(sum(col("w") * col("v")).as("u"))
      val m = u.agg(greatest(expr("max(abs(u)) DIV 1000"), lit(1L)).as("d"))
      v = u.crossJoin(broadcast(m))
        .select(col("i").as("j"), expr("(u - pmod(u, d)) DIV d").as("v"))
    }
    val uF = edges.join(v, "j").groupBy(col("i"))
      .agg(sum(col("w") * col("v")).as("u"))
    val lam = uF.agg(greatest(expr("max(abs(u)) DIV 1000"), lit(1L)).as("lambda_micro"))
    val trace = g.filter(col("i") === col("j"))
      .agg(sum(col("w")).as("trace_micro"))
    v.crossJoin(broadcast(lam)).crossJoin(broadcast(trace))
      .select(col("j").as("comp"), col("v").as("eigvec_milli"),
        col("lambda_micro"),
        col("trace_micro"),
        expr("lambda_micro * 1000 DIV trace_micro").as("top_share_permille"))
      .orderBy(col("comp"))
  }

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
