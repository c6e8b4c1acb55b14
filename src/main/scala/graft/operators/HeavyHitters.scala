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
    val exported = graft.Tables.storeParquet(spark, path)
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
    val est = graft.Tables.storeParquet(spark, estPath)
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

  /** KMV (k-minimum-values) distinct sketch per group — the theta-sketch
    * mechanism (Beyer et al. 2007) behind Druid/Trino set-operation
    * sketches, and the one capability the HLL/MG/GK/CM family here lacks:
    * estimating the size of UNIONS and INTERSECTIONS of key sets without
    * co-shuffling them. Per group keep the k smallest xxhash64 values
    * (ONE rank window, map-side limited by WindowGroupLimit); the k-th
    * smallest normalized hash r estimates the distinct count as
    * (k−1)·2⁶⁴/r, and two groups' sketches combine WITHOUT their base
    * rows: union = k smallest of the merged sketch, intersection via the
    * Jaccard fraction of shared members among the union sketch's k
    * (ρ·D̂∪). All arithmetic in DECIMAL(38,0) over zero-based unsigned
    * hash magnitudes — no floating point, so the export replays exactly.
    */
  private[graft] def kmvSketches(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      // unsigned magnitude: shift signed xxhash64 up by 2^63 into [0, 2^64)
      .withColumn("h", xxhash64(col("user_id")).cast("decimal(38,0)") +
        lit(BigDecimal(2).pow(63).bigDecimal))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    ev.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("event_type"), col("rank").cast("long").as("rank"), col("h"))
  }

  /** Export-replay audit of the KMV set-operation estimates: for every
    * event-type pair, the sketch-combined union and intersection
    * estimates (computed from the two k-row sketches ALONE) are exported
    * once per corpus content; both engines recompute the exact union /
    * intersection distinct counts from the base table and hash-compare
    * integer verdict rows. Bound: ±25% of the exact value — 4× the
    * k = 256 KMV rsd of ~1/√(k−2) ≈ 6.3% — for the union and the
    * (here near-total) intersections.
    */
  def kmvSetOpsAudit(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    val path = s"${graft.operators.Dedup.sketchStorePath(dir)}/kmv_setops"
    graft.operators.Dedup.ensureExport(path, Tables.dirFingerprint(dir)) {
      val sk = kmvSketches(spark, dir, k)
      val types = sk.select(col("event_type")).distinct()
      val pairs = types.select(col("event_type").as("type_a"))
        .join(types.select(col("event_type").as("type_b")), col("type_a") < col("type_b"))
      // pair-combined member set: each pair sees both sketches' hashes;
      // a hash present in both sides is a shared member (same key — the
      // sketches hash the same key domain)
      val memA = sk.select(col("event_type").as("type_a"), col("h"))
      val memB = sk.select(col("event_type").as("type_b"), col("h"))
      val united = pairs.join(memA, Seq("type_a")).withColumn("src", lit("a"))
        .unionByName(pairs.join(memB, Seq("type_b")).withColumn("src", lit("b")))
      val members = united.groupBy(col("type_a"), col("type_b"), col("h"))
        .agg(countDistinct(col("src")).as("nsrc"))
      import org.apache.spark.sql.expressions.Window
      val byPair = Window.partitionBy(col("type_a"), col("type_b")).orderBy(col("h"))
      val two64 = BigDecimal(2).pow(64).toDouble
      // union sketch = k smallest of the combined members; if fewer than k
      // the sketch holds the ENTIRE union and both estimates are exact
      members.withColumn("urank", row_number().over(byPair)).filter(col("urank") <= k)
        .groupBy(col("type_a"), col("type_b"))
        .agg(count(lit(1)).as("m"),
          max(when(col("urank") === k, col("h"))).as("rk"),
          sum(when(col("nsrc") === 2, 1L).otherwise(0L)).as("n_shared"))
        .withColumn("est_union_d",
          when(col("m") < k, col("m").cast("double"))
            .otherwise(lit((k - 1).toDouble) * two64 / col("rk").cast("double")))
        .select(col("type_a"), col("type_b"),
          floor(col("est_union_d")).cast("long").as("est_union"),
          when(col("m") < k, col("n_shared"))
            .otherwise(floor(col("est_union_d") * col("n_shared") / k).cast("long"))
            .cast("long").as("est_inter"))
    }
    val est = graft.Tables.storeParquet(spark, path)
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id")).distinct()
    val ea = ev.select(col("event_type").as("type_a"), col("user_id"))
    val eb = ev.select(col("event_type").as("type_b"), col("user_id"))
    val exact = ea.join(eb, Seq("user_id")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(countDistinct(col("user_id")).as("exact_inter"))
    val sizes = ev.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
    val sa = sizes.select(col("event_type").as("type_a"), col("n").as("na"))
    val sb = sizes.select(col("event_type").as("type_b"), col("n").as("nb"))
    est.join(exact, Seq("type_a", "type_b")).join(sa, "type_a").join(sb, "type_b")
      .withColumn("exact_union", col("na") + col("nb") - col("exact_inter"))
      .select(col("type_a"), col("type_b"),
        col("est_union").cast("long").as("est_union"),
        col("exact_union").cast("long").as("exact_union"),
        col("est_inter").cast("long").as("est_inter"),
        col("exact_inter").cast("long").as("exact_inter"),
        (abs(col("est_union") - col("exact_union")) * 100 <= col("exact_union") * 25 &&
          abs(col("est_inter") - col("exact_inter")) * 100 <= col("exact_union") * 25)
          .cast("long").as("within_bound"))
      .orderBy(col("type_a"), col("type_b"))
  }
}
