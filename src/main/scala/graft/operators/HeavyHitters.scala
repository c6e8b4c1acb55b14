package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory answer to "top frequent tokens over 100 TB" where an
  * exact groupBy would shuffle the whole vocabulary. One pass, O(capacity)
  * memory per partition, partial buffers merged associatively (the only
  * thing that crosses the exchange is one ≤capacity-entry map per
  * partition). The classic guarantee: every item with true frequency
  * > n/capacity is IN the summary, and each reported count is an
  * undercount by at most n/capacity — properties the spec asserts against
  * exact counts at test scale. Counts are approximate and partition-order
  * dependent, so this is deliberately NOT oracle-hashed (same §2.12
  * contract as HLL); the exact twins are `text_vocab` / `agg_distinct`.
  *
  * Reference anchor: the value-counts panel (`FAISS/UI-Demo/
  * pipeline+ui.py:648-651`) — exact there, sketched here for scale.
  */
object HeavyHitters {

  /** Misra–Gries summary of capacity m: on overflow, decrement all
    * counters (the "pay one from every column" step) instead of evicting
    * arbitrarily — that is what buys the n/m error bound.
    */
  class MisraGries(capacity: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {

    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], w: String): mutable.HashMap[String, Long] = {
      if (b.contains(w) || b.size < capacity) b.update(w, b.getOrElse(w, 0L) + 1L)
      else {
        // decrement-all: drop every counter by 1, evict the zeros
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { k =>
          val v = b(k) - 1L
          if (v <= 0L) dead += k else b.update(k, v)
        }
        dead.foreach(b.remove)
      }
      b
    }

    def merge(b1: mutable.HashMap[String, Long],
              b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b2.foreach { case (k, v) => b1.update(k, b1.getOrElse(k, 0L) + v) }
      if (b1.size > capacity) {
        // subtract the (capacity+1)-th largest count from everything —
        // the standard mergeable-summaries reduction (Agarwal et al.),
        // preserving the combined n/m bound
        val cut = b1.values.toArray.sorted(Ordering[Long].reverse)(capacity)
        val dead = mutable.ArrayBuffer.empty[String]
        b1.keysIterator.foreach { k =>
          val v = b1(k) - cut
          if (v <= 0L) dead += k else b1.update(k, v)
        }
        dead.foreach(b1.remove)
      }
      b1
    }

    def finish(b: mutable.HashMap[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (w, c) => (-c, w) }

    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Named query: sketched top tokens of the documents corpus. Output
    * size is fixed (≤ capacity rows); counts are lower bounds.
    */
  def topTokens(spark: SparkSession, dir: String, capacity: Int = 20): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w")).as[String]
    val summary = words.select(new MisraGries(capacity).toColumn.name("s"))
      .as[Seq[(String, Long)]]
    summary.flatMap(identity).toDF("token", "count_lb")
      .orderBy(col("count_lb").desc, col("token"))
  }

  /** Guarantee audit of [[topTokens]] (export-replay oracle): MG counts are
    * partition-order dependent, so the summary itself can't be SQL-hashed —
    * but the CLASSICAL GUARANTEE can: every reported count is a lower bound
    * undercounting by at most n/capacity. The summary is exported once per
    * corpus content; both engines then recount each exported token EXACTLY
    * over their own scan of `documents` (plus the total token count n) and
    * emit the integer verdict count_lb ≤ exact ≤ count_lb + n DIV capacity.
    * The hash compare checks Spark's exact recount equals DuckDB's and that
    * both reach the same verdict on the same exported sketch. Audit-twin
    * pattern of `knn_recall_report`; the production operator stays
    * [[topTokens]] (exact twins: `text_vocab`, `value_counts_top`).
    */
  def topTokensAudit(spark: SparkSession, dir: String, capacity: Int = 20): DataFrame = {
    val path = s"${graft.operators.Dedup.sketchStorePath(dir)}/mg_top"
    graft.operators.Dedup.ensureExport(path, Tables.dirFingerprint(dir)) {
      topTokens(spark, dir, capacity)
    }
    val exported = spark.read.parquet(path)
    val words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
    val total = words.agg(count(lit(1)).as("n"))
    val exact = words.join(broadcast(exported.select(col("token"))), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
    exported.join(exact, "token")
      .crossJoin(broadcast(total))
      .select(col("token"), col("count_lb"), col("exact_n"),
        expr(s"CAST(count_lb <= exact_n AND exact_n <= count_lb + (n DIV $capacity) AS LONG)")
          .as("within_bound"))
      .orderBy(col("count_lb").desc, col("token"))
  }
}
