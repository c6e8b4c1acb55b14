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

  /** Per-domain quota cap — web-corpus curation's anti-skew staple: keep at
    * most `cap` documents per source, preferring the longest (a stand-in
    * quality key), so no single crawl domain dominates the training mix.
    * Rank-limit window ⇒ WindowGroupLimit: each domain's losers are dropped
    * map-side before the shuffle, so the post-filter volume is bounded by
    * cap × n_domains regardless of corpus size.
    */
  def domainCap(spark: SparkSession, dir: String, cap: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .orderBy(col("source"), col("rk"))
  }

  /** Language-mix resampling — the data-mixing step that composes a training
    * corpus to TARGET proportions (e.g. 50% en / 20% es / …) rather than the
    * crawl's natural skew. Per-language quotas are filled in deterministic
    * hash order (salted md5, doc_id tiebreak), so the selected set is a pure
    * function of the keys: re-running over a grown corpus keeps previously
    * selected documents selected until higher-hash rows displace them, and
    * two engines agree row-for-row.
    *
    * Scale shape: quota lookup is a broadcast-literal map projection
    * (`element_at`, null for unbudgeted languages ⇒ dropped by the filter),
    * and the rank-limit window plans as WindowGroupLimit — each language's
    * losers are cut map-side before the stratum shuffle, so post-filter
    * volume is bounded by Σ quotas regardless of corpus size.
    */
  def mixSample(spark: SparkSession, dir: String,
                quotas: Map[String, Int] = Map(
                  "en" -> 100, "es" -> 40, "de" -> 30, "fr" -> 20, "zh" -> 10)): DataFrame = {
    // An empty quota map selects nothing — return the empty result with the
    // contract schema instead of letting `quotas.values.max` throw below.
    if (quotas.isEmpty)
      return Tables.documents(spark, dir)
        .select(col("lang"), col("doc_id"), lit(0L).as("rn"))
        .limit(0)
    val cap = element_at(typedLit(quotas), col("lang"))
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":mix"))).as("h"))
      .withColumn("rn", row_number().over(w))
      // The LITERAL max-quota conjunct is what lets Spark infer
      // WindowGroupLimit (the rule needs rank ≤ literal): every language's
      // candidates are bounded at max(quotas) map-side BEFORE the stratum
      // shuffle; the per-language column cap then refines exactly.
      .filter(col("rn") <= lit(quotas.values.max) && col("rn") <= cap)
      .select(col("lang"), col("doc_id"), col("rn").cast("long").as("rn"))
      .orderBy(col("lang"), col("rn"))
  }

  /** Quality-stratified quota sampling — curation's "N docs per quality
    * band": the Gopher-style score (TextAnalysis.qualityStats, the same
    * expression tree as the `text_quality` gate) is bucketed into 4 FIXED
    * tiers map-side (`least(3, score_micro DIV 250000)` — no global ntile,
    * which would sort the corpus on one partition), then each tier fills
    * to `cap` in salted-hash order. The literal rank bound plans as
    * WindowGroupLimit, so post-filter volume is ≤ 4·cap at any corpus
    * size; the score itself is one explode + two map-combined aggregates.
    */
  def qualityTierSample(spark: SparkSession, dir: String, cap: Int = 50): DataFrame = {
    val scored = TextAnalysis.qualityStats(spark, dir)
      .select(col("doc_id"),
        graft.functions.VectorFunctions.micro(col("score")).as("score_micro"))
      .withColumn("tier", expr("least(score_micro DIV 250000, CAST(3 AS BIGINT))"))
      .withColumn("h", md5(concat(col("doc_id").cast("string"), lit(":qtier"))))
    val w = Window.partitionBy(col("tier")).orderBy(col("h"), col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap)
      .select(col("tier"), col("doc_id"), col("score_micro"), col("rn").cast("long").as("rn"))
      .orderBy(col("tier"), col("rn"))
  }

  /** Seeded epoch shuffle: the deterministic global permutation + shard
    * layout a training run reads each epoch. Order is md5(`doc_id:ep<e>`)
    * — a different permutation per epoch, the same permutation on every
    * re-run (restart-safe data order, unlike `ORDER BY random()`).
    *
    * Scale shape: NO global sort — the shard key is the hash's first
    * byte mod `shards`, each shard orders independently under one window
    * (widen `shards` ≫ executor count at 100 TB; shards are the output
    * files a sequential reader consumes). Position is dense 0..n−1 within
    * the shard.
    */
  def epochShuffle(spark: SparkSession, dir: String, epoch: Int = 1,
                   shards: Int = 8): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(s":ep$epoch"))).as("ord"))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(ord, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(ord, 2, 1))") - 1).cast("long") % shards)
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
    d.withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** Token-budget sequence packing: shuffle documents into a deterministic
    * hash order, then cut the stream into contiguous ~`budget`-token packs —
    * the concat-and-chunk step that turns a cleaned corpus into fixed-length
    * training sequences. The order AND the shard are both derived from the
    * md5 hash, so packing is reproducible anywhere.
    *
    * Scale shape: packing is per-shard (shard = first hash nibble, 16-way
    * here; widen to 2+ nibbles for more parallelism at 100 TB — shards are
    * independent output files, which is what a real writer wants anyway),
    * so the running sum is a bounded window per shard, never a global
    * single-partition prefix sum.
    */
  def packSequences(spark: SparkSession, dir: String, budget: Int = 2048): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit(":pack"))).as("ord"))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', substring(ord, 1, 1))") - 1).cast("long"))
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id", expr(s"CAST((cum - n_tokens) DIV $budget AS BIGINT)"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL 2006): each row
    * draws a deterministic hash-uniform u ∈ (0, 1] and takes priority key
    * u^(1/w) — the top-n keys ARE an exact weighted sample without
    * replacement. Used with w = n_chars, this is "sample documents
    * proportional to token mass", the selection rule a training mix uses
    * so that long documents aren't under-represented per byte.
    *
    * Computed as ln(u)/w (same argmax, no pow): u comes from the md5
    * 24-bit prefix shifted to (0,1] so it can never be 0. The ranking key
    * is a double but the OUTPUT is the selected id set only (integer
    * columns, doc_id order), keeping engine libm differences away from
    * the hash compare — the [[dsirSelect]] contract. A pure map-side
    * projection + TakeOrderedAndProject: no shuffle at any corpus size.
    */
  def weightedSample(spark: SparkSession, dir: String, n: Int = 100): DataFrame = {
    val u = (conv(substring(keyHash(col("doc_id")), 1, 6), 16, 10).cast("double") + 1.0) /
      lit((1 << 24).toDouble)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (log(u) / col("n_chars").cast("double")).as("k"))
      .orderBy(col("k").desc, col("doc_id")).limit(n)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget apportionment — the data-MIXING planning step: split a
    * fixed training-token budget across languages proportionally to their
    * corpus mass, with largest-remainder (Hamilton) rounding so the
    * allocations are integers that sum EXACTLY to the budget (floor
    * division under-allocates; the leftover goes to the largest
    * remainders, lang as the deterministic tiebreak). Everything is
    * exact integer arithmetic over the per-language aggregate — the plan
    * table is |langs| rows, so the partition-less windows here run over
    * a handful of post-aggregate rows, never corpus data.
    */
  def budgetPlan(spark: SparkSession, dir: String, budget: Long = 1000000L): DataFrame = {
    val mass = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("mass"))
    hamilton(mass.withColumn("share", col("mass")), budget)
      .select(col("lang"), col("mass"), col("base"), col("alloc"))
      .orderBy(col("lang"))
  }

  /** Largest-remainder (Hamilton) apportionment of `budget` over the
    * per-language integer `share` column: base = floor shares, leftover
    * goes to the largest remainders (lang as deterministic tiebreak), so
    * allocations are integers summing EXACTLY to the budget.
    *
    * budget·share widened to DECIMAL(38,0) before multiplying: at the
    * corpus scale the Scaladoc claims exactness for (share = Σ n_chars
    * over 100 TB), the 64-bit product would silently wrap in non-ANSI
    * Spark while DuckDB errors — the decimal product stays exact and
    * DIV/% land back in BIGINT range (quotient ≤ budget, rem < total).
    */
  private def hamilton(shares: DataFrame, budget: Long): DataFrame = {
    val one = Window.partitionBy(lit(1))
    shares.withColumn("total", sum(col("share")).over(one))
      .withColumn("base",
        expr(s"(CAST($budget AS DECIMAL(38,0)) * share) DIV total").cast("long"))
      .withColumn("rem",
        expr(s"(CAST($budget AS DECIMAL(38,0)) * share) % total").cast("long"))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(one))
      .withColumn("rr", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("lang"))))
      .withColumn("alloc",
        col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
  }

  /** Neyman-allocation sampling plan: per-stratum sample sizes ∝ N_l·σ_l
    * — the variance-OPTIMAL allocation for estimating a corpus mean under
    * stratified sampling (Neyman 1934), here stratified by language with
    * n_chars as the measured variable. Proportional allocation
    * ([[budgetPlan]]) oversamples strata that are merely LARGE; Neyman
    * spends budget where the strata are VARIABLE, which is what an
    * auditing pass (mean quality, mean length) actually needs.
    *
    * Engine-exact fractionals, the [[temperaturePlan]] rule: N_l·σ_l =
    * √(N_l·S2_l − S1_l²) with the radicand an EXACT decimal (power sums,
    * the agg_moments idiom), integerized immediately through the one
    * IEEE-correctly-rounded fractional op (sqrt); the Hamilton tail then
    * stays all-integer, so allocations sum exactly to the budget in both
    * engines. |langs|-row arithmetic after one map-combined scan.
    */
  def neymanPlan(spark: SparkSession, dir: String, budget: Long = 10000L): DataFrame = {
    val stats = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars").cast("decimal(38,0)")).as("s1"),
        sum((col("n_chars").cast("decimal(38,0)") * col("n_chars"))
          .cast("decimal(38,0)")).as("s2"))
    val w = stats.withColumn("share",
      floor(sqrt(expr("CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)")))
        .cast("long"))
    hamilton(w, budget)
      .select(col("lang"), col("n"), col("share").as("neyman_w"), col("alloc"))
      .orderBy(col("lang"))
  }

  /** Temperature-scaled mixing plan — the multilingual-LLM sampling rule
    * p_l ∝ mass_l^α with α = 1/2 (α < 1 upweights low-resource languages;
    * α = 1 is [[budgetPlan]]'s proportional split, α = 0 uniform). The
    * fractional power is the ONLY non-integer step, and it is made
    * engine-exact by integerizing immediately: share_l = ⌊10⁶·√mass_l⌋ —
    * IEEE 754 requires sqrt to be correctly rounded (unlike ln/pow, which
    * is why α is the square root here and not a free parameter), so both
    * engines compute the identical share and the Hamilton tail stays all-
    * integer. Same |langs|-row plan shape as [[budgetPlan]].
    */
  def temperaturePlan(spark: SparkSession, dir: String, budget: Long = 1000000L): DataFrame = {
    val mass = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("mass"))
    val shares = mass.withColumn("share",
      floor(sqrt(col("mass").cast("double")) * lit(1000000.0)).cast("long"))
    hamilton(shares, budget)
      .select(col("lang"), col("mass"), col("share"), col("base"), col("alloc"))
      .orderBy(col("lang"))
  }

  /** DSIR-style data selection (Xie et al., "Data Selection for Language
    * Models via Importance Resampling", arXiv:2302.03169): pick the raw
    * corpus documents whose hashed-n-gram feature profile most resembles a
    * target domain. Features are hashed word unigrams (md5 mod `buckets` —
    * the engine-portable stand-in for DSIR's hashed n-grams); the target
    * and raw corpora each induce a Laplace-smoothed multinomial over the
    * buckets, and a document's log importance weight is
    * Σ_w [log p_target(b(w)) − log p_raw(b(w))] over its tokens. The top
    * `n` documents by weight are the selected training mix. Here the
    * target domain is the English slice (the labeled stand-in for "looks
    * like Wikipedia" — any target predicate slots in).
    *
    * Scale shape — ONE corpus-linear tokenize pass, no quadratic step
    * anywhere: the token→bucket projection (the md5 is the only per-token
    * work) immediately collapses to per-(doc, bucket) counts in a
    * map-combined agg, and everything downstream derives from that compact
    * frame: the two per-bucket model tables are re-aggregations of it
    * (≤ `buckets` rows each — the "model" is a 1024-row table), and the
    * per-document weight is Σ_b c·llr(b) — a broadcast-join of the count
    * frame to the tiny log-ratio table + one map-combined per-doc sum.
    * Selection is a rank-limit top-n (TakeOrderedAndProject). At 100 TB
    * the model tables still fit in one broadcast block, and the corpus is
    * tokenized exactly once instead of once per model table.
    *
    * Output is the SELECTED SET (doc_id, lang, n_tokens sorted by doc_id),
    * deliberately not the float weights: the log-sum is reproducible across
    * engines at selection granularity (the oracle replays the identical
    * arithmetic in DuckDB), but emitting raw doubles would make the hash
    * compare hostage to last-ulp libm differences. Integer columns only.
    */
  def dsirSelect(spark: SparkSession, dir: String, buckets: Int = 1024,
                 n: Int = 100): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // The one corpus pass: tokenize, bucket, collapse to (doc, bucket)
    // counts — then CHECKPOINT the compact frame. Catalyst does not share
    // logical subtrees, so without the checkpoint every downstream
    // reference (model counts + per-doc scoring) would re-tokenize the
    // corpus from the scan; localCheckpoint materializes the counts once
    // (on a real cluster, `checkpoint` to reliable storage — same pattern
    // as the pagerank edge list).
    val dc = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("b",
        conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long") % buckets)
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // Both multinomials in ONE aggregation over the count frame (target is
    // a predicate over the same rows, so a conditional sum replaces the
    // separate target count + full-outer merge — every raw bucket is
    // present, target-absent buckets get ct = 0); totals via a window over
    // the ≤ `buckets`-row model table, Laplace +1 smoothing.
    val one = Window.partitionBy(lit(1))
    val llr = dc.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"))
      .withColumn("nr", sum(col("cr")).over(one))
      .withColumn("nt", sum(col("ct")).over(one))
      .select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("nt") + buckets).cast("double")) -
          log((col("cr") + 1).cast("double") / (col("nr") + buckets).cast("double")))
          .as("llr"))
    // Per-doc weight as Σ_b c·llr(b) over the count frame (the oracle
    // computes the identical grouped product-sum, keeping the float
    // arithmetic shape the same on both engines).
    val scored = dc.join(broadcast(llr), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c").cast("double") * col("llr")).as("weight"))
    scored.orderBy(col("weight").desc, col("doc_id")).limit(n)
      .select(col("doc_id"), col("lang"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Contamination-safe train/valid/test split: the split hash is taken
    * over the CONTENT key (md5 of the text), not the row id, so verbatim
    * copies of a document can never straddle splits — the leakage mode a
    * doc_id-hashed split ([[trainTestSplit]]) is blind to when the corpus
    * still contains duplicates (eval rows that also sit in train score as
    * memorized). Group-aware splitting is the standard fix; the exact-text
    * group is the SQL-expressible tier of it (near-dup-cluster splitting
    * composes this with [[Dedup.dedupClusters]]' representative as the key).
    *
    * Still a pure map-side projection — no shuffle, no group materialization:
    * hashing the content IS the group agreement. Buckets 0..99: < trainPct
    * train, < trainPct+validPct valid, else test.
    */
  def groupedSplit(spark: SparkSession, dir: String,
                   trainPct: Int = 80, validPct: Int = 10): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        (conv(substring(md5(concat(md5(col("text")), lit(":gsplit"))), 1, 6), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + validPct, lit("valid"))
          .otherwise(lit("test")))
      .orderBy(col("doc_id"))

  /** NEAR-DUP-cluster-aware split — the strongest tier of contamination
    * safety: the split hash runs over the document's near-dup CLUSTER
    * representative ([[Dedup.ccLabels]]' connected-component min-id over
    * the n-gram Jaccard graph; singletons represent themselves), so not
    * just verbatim copies ([[groupedSplit]]) but paraphrased/partially-
    * edited twins land in one split — the leakage mode that actually
    * inflates eval scores. The cluster labels are the SAME persisted
    * artifact `dedup_clusters`/`dedup_keep_best` consume (memoized per
    * corpus snapshot; a production pipeline materializes them once), so
    * the split adds one broadcast-size hash projection on top.
    */
  def clusterSplit(spark: SparkSession, dir: String,
                   trainPct: Int = 80, validPct: Int = 10,
                   threshold: Double = 0.12): DataFrame = {
    val cc = Dedup.ccLabels(spark, dir, threshold)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(cc, col("doc_id") === cc("node"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("bucket",
        conv(substring(md5(concat(col("cluster_id").cast("string"), lit(":csplit"))), 1, 6),
          16, 10).cast("long") % 100)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + validPct, lit("valid"))
          .otherwise(lit("test")))
      .orderBy(col("doc_id"))
  }

  /** Global token offsets over the epoch-shuffled stream: every document's
    * absolute start position in the concatenated token stream a trainer
    * reads — the index that lets a checkpoint say "resume at token
    * 1.7 × 10¹²" and seek straight to the right document.
    *
    * A global running sum is trivially `SUM() OVER (ORDER BY ...)` — and
    * that window is a single-partition global sort, the one shape that
    * cannot scale. This computes the identical numbers as a TWO-PHASE
    * prefix sum: (1) within-shard running sums under the per-shard window
    * ([[epochShuffle]]'s order, shards are independent); (2) per-shard
    * totals — `shards` rows — cumulated into shard base offsets and
    * broadcast-joined back. Phase 2's window runs over ≤ `shards` rows
    * regardless of corpus size, so the global order costs one tiny
    * driver-size aggregate instead of a corpus-wide sort. The oracle runs
    * the naive global window and the hashes must agree — that equality IS
    * the two-phase correctness proof, re-checked at every scale factor.
    */
  def globalOffsets(spark: SparkSession, dir: String, epoch: Int = 1,
                    shards: Int = 8): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"),
        md5(concat(col("doc_id").cast("string"), lit(s":ep$epoch"))).as("ord"))
      .withColumn("shard",
        ((expr("instr('0123456789abcdef', substring(ord, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(ord, 2, 1))") - 1).cast("long") % shards)
    val w = Window.partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = d.withColumn("cum", sum(col("n_tokens")).over(w))
    val shardW = Window.partitionBy(lit(1)).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val bases = within.groupBy(col("shard")).agg(sum(col("n_tokens")).as("tot"))
      .withColumn("base", coalesce(sum(col("tot")).over(shardW), lit(0L)))
      .select(col("shard"), col("base"))
    within.join(broadcast(bases), "shard")
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("base") + col("cum") - col("n_tokens")).as("start_offset"))
      .orderBy(col("start_offset"))
  }
}
