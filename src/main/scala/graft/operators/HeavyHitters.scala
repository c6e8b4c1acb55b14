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

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — the point-query
    * companion to Misra–Gries: `depth` hash rows × `width` counters answer
    * "how often did key k occur?" for ANY k after one pass, in
    * depth×width bounded memory. Built declaratively: each event explodes
    * into `depth` (row, bucket) cells — bucket = xxhash64(key, row) mod
    * width, a different hash function per row by seeding with the row
    * index — and ONE map-combined aggregate counts every cell. The
    * estimate for a key is the MIN over its `depth` cells (each cell
    * overcounts by colliding keys, never undercounts). At 100 TB the
    * sketch is still depth×width rows — the shuffle carries ≤ that many
    * partial counters per partition regardless of corpus size.
    */
  private[graft] def countMinSketch(events: DataFrame, key: org.apache.spark.sql.Column,
                                        width: Int, depth: Int): DataFrame =
    events.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), pmod(xxhash64(key, lit(d)), lit(width.toLong)).as("bucket"))): _*))
        .as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Error-bound audit of the Count-Min sketch (export-replay oracle).
    * xxhash64 isn't replayable in the oracle engine, so the ESTIMATES for
    * the deterministic probe set (top-`topK` exact keys) are exported once
    * per corpus content; both engines then recompute the exact counts and
    * the stream length n independently and hash-compare the integer
    * verdict rows: est ≥ exact (CM never undercounts — structural) and
    * (est − exact)·width ≤ 8·n (8× the expected n/width collision mass;
    * Markov bounds a single row's excess above that at ≤ 1/8, the min
    * over `depth` independent rows at ≤ 8⁻⁴ per key). Same audit-twin
    * contract as [[topTokensAudit]] / `agg_approx_distinct`.
    */
  def countMinAudit(spark: SparkSession, dir: String, width: Int = 4096,
                    depth: Int = 4, topK: Int = 20): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val estPath = s"${graft.operators.Dedup.sketchStorePath(dir)}/cm_est"
    graft.operators.Dedup.ensureExport(estPath, Tables.dirFingerprint(dir)) {
      val sketch = countMinSketch(ev, col("user_id"), width, depth)
      val probes = ev.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("user_id")).limit(topK)
      val cells = probes.select(col("user_id"), explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), pmod(xxhash64(col("user_id"), lit(d)), lit(width.toLong)).as("bucket"))): _*))
          .as("cell"))
        .select(col("user_id"), col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      // sketch is depth×width rows → broadcast side of the probe join
      cells.join(broadcast(sketch), Seq("d", "bucket"))
        .groupBy(col("user_id"))
        .agg(min(col("cnt")).as("est_cnt"))
    }
    val est = spark.read.parquet(estPath)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val total = ev.agg(count(lit(1)).as("n_total"))
    est.join(exact, "user_id")
      .crossJoin(broadcast(total))
      .select(col("user_id").cast("long").as("user_id"),
        col("est_cnt").cast("long").as("est_cnt"),
        col("exact_cnt").cast("long").as("exact_cnt"),
        col("n_total").cast("long").as("n_total"),
        (col("est_cnt") >= col("exact_cnt") &&
          (col("est_cnt") - col("exact_cnt")) * lit(width.toLong) <= lit(8L) * col("n_total"))
          .cast("long").as("within_bound"))
      .orderBy(col("user_id"))
  }
}
