package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sampling for training-data pipelines: train/test split,
  * uniform sampling, and per-stratum sampling — the selection operators a
  * 100 TB corpus job runs before anything else touches the data.
  *
  * The randomness source is a keyed hash (md5 of the row key), NOT an RNG:
  *  - reproducible across runs, engines, partitionings and cluster sizes —
  *    resampling a grown corpus keeps previously-assigned rows in the same
  *    split (the property `df.sample`/`random.sample` lacks, and the reason
  *    real pipelines hash instead; the reference samples in-memory with
  *    python `random.sample`, which only works because its corpus fits on
  *    one node);
  *  - embarrassingly parallel: a pure map-side projection, no shuffle, no
  *    seed coordination between executors;
  *  - SQL-expressible, so every variant is DuckDB-oracle-checked.
  *
  * Split assignment uses the first 6 hex chars of the md5 (24 bits) reduced
  * mod 100 — a uniform bucket in [0,100) independent of corpus size.
  */
object Sampling {

  /** md5 hex of the row key — the shared hash for all sampling variants. */
  private def keyHash(key: Column): Column = md5(key.cast("string"))

  /** Hash bucket in [0, 100): first 24 md5 bits mod 100. */
  def hashBucket(key: Column): Column =
    conv(substring(keyHash(key), 1, 6), 16, 10).cast("long") % 100

  /** Deterministic train/test split: bucket < trainPct ⇒ train.
    * (`random.sample`-style selection, `FAISS/PlainDemo/pipeline.py:80`,
    * re-expressed as a stable hash so the split survives re-runs.)
    */
  def trainTestSplit(spark: SparkSession, dir: String, trainPct: Int = 80): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split", when(col("bucket") < trainPct, lit("train")).otherwise(lit("test")))
      .orderBy(col("doc_id"))

  /** Uniform n-row sample: order by hash, take n — every row has equal
    * selection probability, and the chosen set is a pure function of the
    * keys. TakeOrderedAndProject at any scale (no global sort materialized).
    */
  def uniformSample(spark: SparkSession, dir: String, n: Int = 50): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), substring(keyHash(col("doc_id")), 1, 8).as("h8"))
      .orderBy(col("h8"), col("doc_id"))
      .limit(n)

  /** Stratified sample: nPer rows per language stratum, chosen by hash
    * order within the stratum — the class-balanced selection a fine-tuning
    * mix needs. Rank-limit window ⇒ WindowGroupLimit (partial top-k before
    * the stratum shuffle).
    */
  def stratifiedSample(spark: SparkSession, dir: String, nPer: Int = 20): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), keyHash(col("doc_id")).as("h"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nPer)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn"))
  }
}
