package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.VectorSearch
import graft.functions.VectorFunctions._

/** The persisted form of the IVF "index" (SURVEY.md §1.2): a clustered
  * parquet layout `partitionBy(cell_id)` plus a tiny centroid table.
  *
  * This is what "vector index" means on a lake at 100 TB: not a mutable
  * in-memory structure (`index.add`, `FAISS/PlainDemo/pipeline.py:321`) but
  * a partitioned materialization whose directory layout IS the coarse
  * quantizer — a probed query equi-joins on `cell_id` and the scan planner
  * prunes to nprobe/nlist of the files (`PartitionFilters` in the plan),
  * the same data-skipping FAISS gets from its inverted lists.
  */
object IndexStore {

  /** Build and persist the clustered index: rows under
    * `path/rows/cell_id=*` and centroids under `path/centroids`, plus a
    * `_build_id` marker stamped fresh per build — dependent artifacts
    * (PqStore's codes, which bake in this index's cell assignment) record
    * the marker they were built against and compare CONTENT, not
    * filesystem mtimes (directory mtimes are not preserved across
    * copy/restore and only change on direct-child writes).
    */
  def write(spark: SparkSession, dir: String, path: String): Unit = {
    writeFrom(Tables.embeddings(spark, dir), path)
    stampSourceFp(path, dir)
  }

  /** Build and persist a store from an explicit vector frame (subset /
    * ingest-side stores). Stamps `_build_id` only — callers that derive
    * the frame from a data dir add their own `_src_fp` staleness marker
    * ([[write]], [[ensureSubset]]).
    */
  def writeFrom(vectors: DataFrame, path: String): Unit = {
    val (assigned, centroids) = VectorSearch.ivfBuildFrom(vectors)
    assigned.write.mode("overwrite")
      .partitionBy("cell_id")
      .parquet(s"$path/rows")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    stampBuildId(path)
  }

  /** Day-2 maintenance: absorb new vectors into an EXISTING store without
    * re-clustering — assign each to its nearest current centroid (the same
    * assignment rule queries probe by) and append into the matching
    * `rows/cell_id=*` partitions. This is what FAISS `index.add` does
    * post-train (`pipeline.py:321-323` adds to a trained index): centroids
    * stay fixed, so probed search finds the new rows with zero rebuild;
    * the documented drift contract is that cells slowly unbalance as data
    * drifts and a periodic [[rebuild]] (or compaction) re-trains. A fresh
    * `_build_id` is stamped so dependent artifacts (PqStore codes, the
    * planner's memoized store detection) see the content change and
    * re-derive instead of serving a row set they never encoded.
    */
  def absorb(spark: SparkSession, path: String, vectors: DataFrame): Unit = {
    val centroids = graft.Tables.storeParquet(spark, s"$path/centroids")
    VectorSearch.assignCells(vectors, centroids)
      .write.mode("append").partitionBy("cell_id").parquet(s"$path/rows")
    stampBuildId(path)
  }

  /** Small-files hygiene for the IVF absorb append path — the exact twin
    * of `PqStore.layoutCompactQuery` pointed at `rows/cell_id=*` (each
    * per-batch [[absorb]] appends a file per touched cell; the audit is
    * the measured decision input the compaction was missing): fragment a
    * working clone with three deterministic absorb chunks, rewrite every
    * cell above `targetFiles` via dynamic partition overwrite, and return
    * the post-compaction files-per-cell audit plus a source-recomputed
    * conservation column. Build-once per half-store generation;
    * re-executions pay the audit scan only.
    */
  def layoutCompactQuery(spark: SparkSession, dir: String,
                         targetFiles: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    val half = ensureCorpusHalf(spark, dir)
    val work = defaultPath(dir) + "_plc"
    val gen = graft.streaming.StreamOps.storeGeneration(half)
    val marker = java.nio.file.Paths.get(s"$work/_built_from")
    val current = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker).trim == gen &&
      new java.io.File(s"$work/rows").exists()
    if (!current) {
      cloneStore(half, work)
      val odd = Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 1)
      (0 until 3).foreach { i =>
        absorb(spark, work, odd.filter((col("vec_id") / 2).cast("long") % 3 === i))
      }
      val needy = graft.Tables.storeParquet(spark, s"$work/rows")
        .select(col("cell_id"), input_file_name().as("f"))
        .groupBy(col("cell_id"))
        .agg(countDistinct(col("f")).as("n_files"))
        .filter(col("n_files") > targetFiles)
        .select(col("cell_id")).collect().map(_.get(0)) // ≤ nlist rows
      if (needy.nonEmpty) {
        graft.Tables.storeParquet(spark, s"$work/rows")
          .filter(col("cell_id").isin(needy.toIndexedSeq: _*))
          .repartition(needy.length, col("cell_id"))
          .localCheckpoint()
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("cell_id")
          .parquet(s"$work/rows")
      }
      java.nio.file.Files.writeString(marker, gen)
    }
    val corpusRows = Tables.embeddings(spark, dir).count()
    graft.Tables.storeParquet(spark, s"$work/rows")
      .select(col("cell_id").cast("long").as("cell_id"), input_file_name().as("f"))
      .groupBy(col("cell_id"))
      .agg(countDistinct(col("f")).as("n_files"), count(lit(1)).as("n_rows"))
      .withColumn("rows_per_file", expr("n_rows DIV n_files"))
      .withColumn("corpus_rows", lit(corpusRows))
      .orderBy(col("cell_id"))
  }

  /** Drift-DRIVEN day-2 maintenance — the consumer of the
    * [[centroidDrift]] monitor: measure, decide, act. The decision rule a
    * serving cluster runs nightly is `absorb` while the index still
    * represents its data (max split-half cell drift below τ — cheap
    * append into current cells, centroids fixed) and `rebuild` once any
    * cell has drifted past τ (full re-train over live ∪ incoming — the
    * expensive off-peak job). Acts on a MAINTENANCE COPY seeded from the
    * even-id half (the [[ensureCorpusHalf]] day-1/day-2 split: odd ids
    * play the incoming crawl), reset at every invocation so the operation
    * is idempotent per run; returns the path that would now SERVE
    * (blue/green: absorb serves the same store, rebuild serves the
    * re-trained one).
    */
  /** Pristine day-1 state (even half clustered), built ONCE per source
    * generation; [[maintain]] resets its working copy from this by file
    * copy, so the per-invocation reset costs IO, not a k-means train.
    */
  private[graft] def ensureMaintDay1(spark: SparkSession, dir: String): String = {
    val p = defaultPath(dir) + "_maint_day1"
    if (!new java.io.File(s"$p/centroids").exists() || !sourceFpCurrent(p, dir)) {
      writeFrom(Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 0), p)
      stampSourceFp(p, dir)
    }
    p
  }

  /** Reset `to` as a byte-for-byte copy of the store at `from` — the
    * per-run working-copy idiom shared by [[maintain]] and the streaming
    * absorb run (each invocation acts on a fresh clone so the operation is
    * idempotent per run and the pristine store keeps serving its oracles).
    */
  private[graft] def cloneStore(from: String, to: String): Unit = {
    graft.streaming.StreamOps.rmTree(new java.io.File(to))
    copyTree(new java.io.File(from), new java.io.File(to))
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def maintain(spark: SparkSession, dir: String, decision: String): String = {
    val maintPath = defaultPath(dir) + "_maint"
    val emb = Tables.embeddings(spark, dir)
    // day-1 reset: file-copy the pristine clustered even half into place
    cloneStore(ensureMaintDay1(spark, dir), maintPath)
    val incoming = emb.filter(col("vec_id") % 2 =!= 0)
    decision match {
      case "absorb" =>
        absorb(spark, maintPath, incoming)
        maintPath
      case _ =>
        absorb(spark, maintPath, incoming) // land the batch, then re-train
        val rb = maintPath + "_rb"
        rebuild(spark, maintPath, rb, emb.select(col("vec_id")).limit(0))
        rb
    }
  }

  /** The registered maintenance query (`embed_maintain`): the canonical
    * store's oracle-proven drift report drives the τ decision, the
    * decided action actually runs against the maintenance copy, and the
    * report surfaces the decision as a column (the knn_filtered_adaptive
    * idiom — the plan's chosen branch is part of the result). `rows_after`
    * re-reads the serving store post-action: both branches must end
    * serving every vector (|even| + |odd| = |embeddings|), which the
    * oracle checks as the corpus count while the branch-specific
    * structure (centroids fixed vs re-trained) is spec-pinned. The only
    * driver-side scalar is the max over the ≤nlist-row drift report.
    *
    * τ calibration: drift_metric = Σ over 64 dims of (split-half
    * per-dim mean diff in micros)², so pure sampling noise for a cell of
    * n/2-per-parity ≈ 64·(σ·10⁶)²·(2/n) with σ≈0.3 — about 10¹⁰ at
    * hundreds of rows per cell and FALLING as cells fill. The 10¹²
    * default sits an order above the noise floor of even the small test
    * SFs: crossing it requires the per-dim means to move ~10⁻¹ in
    * embedding units — structural drift, not noise.
    */
  def maintainQuery(spark: SparkSession, dir: String,
                    tauMicroSq: Long = 1000000000000L): DataFrame = {
    // ≤nlist-row report: localCheckpoint (not cache) — materializes once
    // for the two consumers and its blocks are reclaimed by the context
    // cleaner when the frame goes out of scope, so repeated maintenance
    // calls in a long-lived session can't accumulate pinned cached blocks.
    val drift = centroidDrift(spark, dir).localCheckpoint()
    val maxDrift = drift.agg(max(col("drift_metric"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val decision = if (maxDrift >= tauMicroSq) "rebuild" else "absorb"
    val servingPath = maintain(spark, dir, decision)
    val rowsAfter = graft.Tables.storeParquet(spark, s"$servingPath/rows").count()
    drift
      .withColumn("decision", lit(decision))
      .withColumn("threshold", lit(tauMicroSq))
      .withColumn("rows_after", lit(rowsAfter))
      .orderBy(col("cell_id"))
  }

  /** The even-vec_id half of a dir's embeddings as its own persisted
    * store — the "existing corpus" the streaming dedup-ingest probes
    * (the odd half plays the incoming crawl). Same canonical-path and
    * content-fingerprint contract as the full store.
    */
  def corpusHalfPath(dir: String): String = defaultPath(dir) + "_half"

  /** Build the even-half store once per source-content generation. */
  def ensureCorpusHalf(spark: SparkSession, dir: String): String = {
    val path = corpusHalfPath(dir)
    if (!new java.io.File(s"$path/centroids").exists() || !sourceFpCurrent(path, dir)) {
      writeFrom(Tables.embeddings(spark, dir).filter(col("vec_id") % 2 === 0), path)
      stampSourceFp(path, dir)
    }
    path
  }

  /** Record the CONTENT fingerprint of the data dir this build read
    * (Tables.dirFingerprint), replacing any previous stamp — ensure()
    * compares it so a regenerated corpus triggers a rebuild instead of
    * being probed through an index built from data that no longer exists.
    */
  private[graft] def stampSourceFp(path: String, dir: String): Unit = {
    val d = new java.io.File(path)
    Option(d.listFiles()).foreach(_.filter(_.getName.startsWith("_src_fp_")).foreach(_.delete()))
    new java.io.File(d, s"_src_fp_${graft.Tables.dirFingerprint(dir)}").createNewFile()
  }

  private[graft] def sourceFpCurrent(path: String, dir: String): Boolean =
    new java.io.File(path, s"_src_fp_${graft.Tables.dirFingerprint(dir)}").exists()

  private def stampBuildId(path: String): Unit = {
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_build_id"),
      java.util.UUID.randomUUID().toString)
    // A fresh build id invalidates the planner's memoized store detection
    // so the very next plan re-reads the marker (and so can never probe
    // the re-clustered layout through stale centroids).
    graft.plans.AnnProbeRewrite.invalidate(path)
  }

  /** The build marker of the store at `path`, if present. */
  def buildId(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(s"$path/_build_id")
    if (java.nio.file.Files.exists(p))
      Some(java.nio.file.Files.readString(p).trim)
    else None
  }

  /** Open the clustered index. */
  def read(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (graft.Tables.storeParquet(spark, s"$path/rows"),
      graft.Tables.storeParquet(spark, s"$path/centroids"))

  /** Probed search against the PERSISTED index: identical query shape to
    * VectorSearch.ivfSearch, but the equi-join key is now also the storage
    * partition key, so the parquet source prunes unprobed cells' files
    * before reading a byte.
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
             k: Int = 5, nprobe: Int = 10): DataFrame = {
    val (rows, centroids) = read(spark, path)
    VectorSearch.ivfSearch(rows, centroids, queries, k, nprobe)
  }

  /** Canonical on-disk location of the index for a given data dir —
    * a pure function of the dir so "build once, search many" callers
    * (and the DuckDB oracle, which replays the probed search over these
    * artifacts) agree on the path without coordination.
    */
  def defaultPath(dir: String): String =
    "/root/repo/data/ivf_store/" + dir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Build the index only if its artifacts don't exist yet OR were built
    * from different source content (`_src_fp_*` mismatch — the driver
    * regenerates the testdata between rounds, and an existence-only check
    * would keep serving an index of the previous corpus). A pre-fingerprint
    * store (artifacts present, markers missing) rebuilds once and records
    * both markers; a store missing only `_build_id` is stamped in place so
    * downstream marker comparisons work without a rebuild.
    */
  def ensure(spark: SparkSession, dir: String, path: String): Unit =
    graft.Profiling.timed("IndexStore.ensure") {
      if (!new java.io.File(s"$path/centroids").exists() || !sourceFpCurrent(path, dir))
        write(spark, dir, path)
      else if (buildId(path).isEmpty) stampBuildId(path)
    }

  /** Probed search with STATIC partition pruning: the probed cell set is
    * tiny driver-side metadata (≤ nq·nprobe ints — the same coarse-quantizer
    * lookup FAISS does before touching inverted lists,
    * `FAISS/PlainDemo/pipeline.py:257` `index.nprobe = 10`), so it is
    * inlined as a literal IN-list and the parquet source prunes unprobed
    * cells' directories at planning time (`PartitionFilters` in the scan).
    * At 100 TB this is the difference between scanning nprobe/nlist of the
    * files and scanning all of them.
    */
  def searchPruned(spark: SparkSession, path: String, queries: DataFrame,
                   k: Int = 5, nprobe: Int = 10,
                   rowPred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    // An optional scalar predicate on the stored rows (the Milvus `expr`
    // surface over the probed path): applied pre-rank, and Catalyst
    // pushes it through the score join into the pruned scan.
    val scored = rowPred.foldLeft(scoreProbed(spark, path, queries, nprobe))(_.filter(_))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), micro(col("sim")).as("sim_micro"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Shared probe+score front half of every persisted-index query: rank
    * cells per query against the broadcast centroids, keep the nprobe
    * nearest, inline the probed cell ids as a literal IN-list (static
    * `PartitionFilters` — the coarse-quantizer skip, decided driver-side
    * from ≤ nq·nprobe ints), equi-join and score. Callers choose the tail:
    * top-k rank window ([[searchPruned]]) or a radius filter
    * ([[rangeSearchPruned]]).
    */
  private def scoreProbed(spark: SparkSession, path: String, queries: DataFrame,
                          nprobe: Int): DataFrame = {
    val (rows, centroids) = read(spark, path)
    val qCells = queries.crossJoin(broadcast(centroids))
      .withColumn("d2", l2DistanceSq(col("qvec"), col("centroid").cast("array<float>")))
    val wc = Window.partitionBy(col("qid")).orderBy(col("d2"), col("cell_id"))
    val probed = qCells.withColumn("cr", row_number().over(wc))
      .filter(col("cr") <= nprobe)
      .select(col("qid"), col("qvec"), col("cell_id"))
    val cells = probed.select(col("cell_id")).distinct().collect().map(_.get(0))
    rows.filter(col("cell_id").isin(cells: _*))
      .join(broadcast(probed), "cell_id")
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("sim", dot(col("qvec"), col("embedding")))
  }

  /** Tombstone-aware probed search — DELETE without rebuild. FAISS
    * `remove_ids` (`FAISS/PlainDemo/pipeline.py:110-112`) mutates its
    * inverted lists eagerly; a lake store cannot, and doesn't need to:
    * deletes accumulate in a (tiny) tombstone set that broadcast
    * anti-joins the scored candidates at query time, UNDER the same
    * static partition pruning — k then fills from live rows only (the
    * anti-join sits below the rank window, never post-filtering a
    * short top-k). Compaction/rebuild becomes an offline maintenance
    * choice instead of a write-path blocker. Tombstones here are the
    * deterministic set vec_id % 17 = 3.
    */
  def searchTombstoned(spark: SparkSession, dir: String,
                       k: Int = 5, nprobe: Int = 10): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val tombstones = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 17 === 3).select(col("vec_id"))
    // Counted, not assumed (graft.Tables.boundedBroadcast): past the
    // inline bound the anti-join degrades to a shuffle instead of forcing
    // a driver-side multi-GB hash build on a bulk delete.
    val scored = scoreProbed(spark, path, VectorSearch.querySet(spark, dir, 5), nprobe)
      .join(graft.Tables.boundedBroadcast(tombstones), Seq("vec_id"), "left_anti")
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("rank"), micro(col("sim")).as("sim_micro"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Self-evaluating recall report — the quality metric the reference's
    * benchmark loop tracks for its ANN configurations: per-query
    * recall@k of the probed store search against the exact brute-force
    * top-k, computed IN the engine (a left-semi membership join of the
    * two ≤ nq·k ranked lists, then one tiny aggregate). Both legs are
    * deterministic, so the report is DuckDB-replayable end to end —
    * the recall dial (nprobe) gets an oracle-checked measurement, not
    * just a spec-side assertion.
    */
  def recallReport(spark: SparkSession, dir: String,
                   k: Int = 5, nq: Int = 5, nprobe: Int = 10): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val approx = searchPruned(spark, path, VectorSearch.querySet(spark, dir, nq), k, nprobe)
      .select(col("qid"), col("vec_id"))
    val exact = VectorSearch.knnExact(spark, dir, k, nq)
      .select(col("qid"), col("vec_id"))
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_found"))
    exact.groupBy(col("qid")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_found"), lit(0L)).as("n_found"), col("n_exact"))
      .withColumn("recall_micro", expr("(n_found * 1000000) DIV n_exact"))
      .orderBy(col("qid"))
  }

  /** Reciprocal-rank eval of the probed search — recall@k asks "did the
    * true neighbors show up"; MRR asks "how HIGH did the true nearest
    * neighbor land", the rank-position metric retrieval evals report
    * (RAG-style serving cares about position, not just membership).
    * Per query: the exact top-1's rank in the probed top-`k` list,
    * rr_micro = 10⁶ DIV rank (0 if missed) — exact integer arithmetic,
    * no libm, so the DuckDB oracle replays it over the exported store.
    *
    * Scale shape: the probed leg is the standard partition-pruned store
    * search; the exact leg is one nq-row top-1; the comparison is an
    * (nq)-row left join. Nothing beyond the searches themselves touches
    * the corpus.
    */
  def mrrReport(spark: SparkSession, dir: String,
                k: Int = 10, nq: Int = 5, nprobe: Int = 10): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val probed = searchPruned(spark, path, VectorSearch.querySet(spark, dir, nq), k, nprobe)
      .select(col("qid"), col("vec_id"), col("rank").cast("long").as("rank"))
    val exact1 = VectorSearch.knnExact(spark, dir, 1, nq)
      .select(col("qid"), col("vec_id"))
    exact1.join(probed, Seq("qid", "vec_id"), "left")
      .select(col("qid"), coalesce(col("rank"), lit(0L)).as("rank"))
      .withColumn("rr_micro",
        when(col("rank") > 0, expr("1000000 DIV rank")).otherwise(lit(0L)))
      .orderBy(col("qid"))
  }

  /** Per-cell centroid DRIFT — the "when to re-train" signal for the
    * [[absorb]]/[[rebuild]] maintenance cycle: as data drifts, cells
    * unbalance and their true centroids move off the trained ones.
    * Measured as the squared distance between the per-dimension means of
    * the even- and odd-id halves of each cell (a split-half estimate of
    * within-cell drift: a stable cell's halves agree; a drifting or
    * bimodal cell's don't). Pure integer arithmetic end to end —
    * components are offset (+1, normalized vectors ⇒ positive) and
    * floored to micros BEFORE any division, so engine floor-division
    * semantics never meet a negative operand (Spark `DIV` truncates,
    * DuckDB `//` floors — they agree only on non-negatives).
    *
    * Scale shape: ONE scan of the clustered store exploded by dimension,
    * a (cell, dim)-keyed map-combined aggregate, and a ≤ nlist-row
    * report. No pairwise anything.
    */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val (rows, _) = read(spark, path)
    val comp = rows
      .select(col("cell_id"), (col("vec_id") % 2 === 0).as("even"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .withColumn("xm", floor((col("x").cast("double") + lit(1.0)) * 1e6).cast("long"))
    comp.groupBy(col("cell_id"), col("dim"))
      .agg(sum(when(col("even"), col("xm")).otherwise(0L)).as("se"),
        sum(when(col("even"), 1L).otherwise(0L)).as("ne"),
        sum(when(!col("even"), col("xm")).otherwise(0L)).as("so"),
        sum(when(!col("even"), 1L).otherwise(0L)).as("no"))
      .filter(col("ne") > 0 && col("no") > 0)
      .withColumn("d", expr("(se DIV ne) - (so DIV no)"))
      .groupBy(col("cell_id").cast("long").as("cell_id"))
      .agg(max(col("ne")).as("n_even"), max(col("no")).as("n_odd"),
        sum(expr("d * d")).as("drift_metric"))
      .orderBy(col("cell_id"))
  }

  /** nprobe → recall CURVE in one query — the recall dial as a table,
    * matching the reference's index-quality intent (Milvus ef=128 search
    * knob, `Milvus/stream1.py:161-162`; FAISS nprobe sweeps). Uses the
    * identity |topk_probed(L) ∩ exact| = |exact ∩ cells(rank ≤ L)|: an
    * exact-top-k member beaten by < k rows globally is beaten by < k rows
    * in any candidate subset containing it, so it always survives the
    * probed top-k — recall@k at level L needs only each exact hit's CELL
    * RANK for its query, not a re-run of the search per level. One
    * conditional aggregation over the (nq·k)-row exact-hit table does the
    * whole sweep: the corpus-scale work is the exact leg (inherent to
    * measuring recall) plus one broadcast lookup of the hits' cell
    * assignments; levels (default 1,2,5,10,nlist) explode only the tiny
    * hit table. Monotone in nprobe by the same identity (spec-asserted).
    */
  def recallSweep(spark: SparkSession, dir: String,
                  k: Int = 5, nq: Int = 5,
                  baseLevels: Seq[Int] = Seq(1, 2, 5, 10)): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val (rows, centroids) = read(spark, path)
    val nlist = centroids.count().toInt // bounded: ≤ 100 centroid rows
    val levels = (baseLevels :+ nlist).distinct.sorted
    val q = VectorSearch.querySet(spark, dir, nq)
    val qCells = q.crossJoin(broadcast(centroids))
      .withColumn("d2", l2DistanceSq(col("qvec"), col("centroid").cast("array<float>")))
    val wc = Window.partitionBy(col("qid")).orderBy(col("d2"), col("cell_id"))
    val cellRank = qCells.withColumn("cr", row_number().over(wc))
      .select(col("qid"), col("cell_id"), col("cr"))
    val exact = VectorSearch.knnExact(spark, dir, k, nq).select(col("qid"), col("vec_id"))
    // hits' cell assignments: broadcast the nq·k exact hits against the
    // store rows — a lookup join, never a corpus shuffle
    val withCell = rows.select(col("vec_id"), col("cell_id"))
      .join(broadcast(exact), "vec_id")
      .join(broadcast(cellRank), Seq("qid", "cell_id"))
    withCell
      .select(col("cr"), explode(lit(levels.toArray)).as("nprobe"))
      .groupBy(col("nprobe").cast("long").as("nprobe"))
      .agg(count(lit(1)).as("n_exact"),
        sum(when(col("cr") <= col("nprobe"), 1L).otherwise(0L)).as("n_found"))
      .withColumn("recall_micro", expr("n_found * 1000000 DIV n_exact"))
      .select(col("nprobe"), col("n_found"), col("n_exact"), col("recall_micro"))
      .orderBy(col("nprobe"))
  }

  /** Self-tuning probed search: pick the SMALLEST measured nprobe whose
    * recall@k clears the target ([[recallSweep]]'s curve — recall at
    * nprobe = nlist is 1.0 by construction, so a feasible level always
    * exists for target ≤ 1.0), then run the partition-pruned search with
    * that knob. This is the auto-tune loop every vector DB wraps around
    * its ef/nprobe dial (Milvus ef, FAISS nprobe), done the database way:
    * derive the knob from MEASURED statistics on the persisted artifact,
    * not from a hand-tuned constant. The curve costs one bounded sweep
    * (nq·k hit rows), the decision is a driver-side min over ≤ |levels|
    * rows, and the search itself stays the static-INSET pruned scan.
    * The chosen knob is surfaced as a column so callers (and the oracle)
    * can audit the decision.
    */
  def autoTuneSearch(spark: SparkSession, dir: String, k: Int = 5, nq: Int = 5,
                     targetRecallMicro: Long = 900000L): DataFrame = {
    val np = recallSweep(spark, dir, k, nq) // ensures the store
      .filter(col("recall_micro") >= targetRecallMicro)
      .agg(min(col("nprobe"))).head.getLong(0)
    searchPruned(spark, defaultPath(dir),
      VectorSearch.querySet(spark, dir, nq), k, nprobe = np.toInt)
      .withColumn("nprobe", lit(np))
  }

  /** Offline compaction/rebuild — the maintenance half of
    * [[searchTombstoned]]: fold the tombstones in (drop dead rows),
    * RETRAIN the coarse quantizer on the live set (cluster drift after
    * heavy deletes is exactly why vector DBs rebuild rather than only
    * filter), rewrite the clustered layout, and stamp a fresh `_build_id`
    * so dependent artifacts (PqStore codes) detect the change. Runs
    * against the persisted store only — the original corpus is not
    * re-read; on a cluster this is the off-peak job that turns
    * query-time tombstone filtering back into pure partition pruning.
    */
  def rebuild(spark: SparkSession, path: String, rebuiltPath: String,
              tombstones: DataFrame): Unit = {
    val (rows, _) = read(spark, path)
    val live = rows.drop("cell_id")
      .join(graft.Tables.boundedBroadcast(tombstones.select(col("vec_id"))),
        Seq("vec_id"), "left_anti")
    val n = live.count()
    val nlist = math.max(1, math.min(100, math.sqrt(n.toDouble).toInt))
    // Cached for the two consumers (assignment + write); unpersisted in a
    // finally so a failed write can't leak the cached blocks into the
    // session for the store's lifetime.
    val centroids = VectorSearch.kmeansFit(live, nlist, knownCount = Some(n)).cache()
    try {
      VectorSearch.assignCells(live, centroids).write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(s"$rebuiltPath/rows")
      centroids.write.mode("overwrite").parquet(s"$rebuiltPath/centroids")
      stampBuildId(rebuiltPath)
    } finally centroids.unpersist(blocking = false)
  }

  /** The V5 named query, build-once / search-many: ensure the persisted
    * index exists for `dir`, then run the partition-pruned probed search.
    * First execution pays the k-means build (`index.train+add`,
    * `pipeline.py:315-321`); every later execution is search-only against
    * the clustered layout — the shape a serving cluster actually runs.
    */
  def searchQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    searchPruned(spark, path, VectorSearch.querySet(spark, dir, 5))
  }

  /** The NAIVE flat nearest-neighbor query over the persisted clustered
    * rows — "ORDER BY distance LIMIT k" with no knowledge of probing, the
    * exact query a FAISS `IndexFlatL2` user writes
    * (`FAISS/PlainDemo/pipeline.py:232`). [[graft.plans.AnnProbeRewrite]]
    * recognizes this shape over the store layout and injects the static
    * `cell_id IN (<nprobe nearest cells>)` filter at planning time, so
    * this flat scan executes as the partition-pruned probed search —
    * querying THROUGH the index opts into index (approximate) semantics,
    * exactly as in FAISS/Milvus; exact search reads the base table.
    */
  def flatTopK(spark: SparkSession, path: String, qid: Long,
               qvec: Array[Float], k: Int = 5): DataFrame = {
    val (rows, _) = read(spark, path)
    rows.filter(col("vec_id") =!= lit(qid))
      .select(lit(qid).as("qid"), col("vec_id"),
        dot(typedlit[Seq[Float]](qvec.toSeq), col("embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** The `knn_rewrite` named query: the naive [[flatTopK]] plan for each of
    * the 5 standard query vectors, rewritten by AnnProbeRewrite into the
    * probed form — row-identical to [[searchQuery]] (`knn_ivf`), and
    * replayed by the SAME exported-store DuckDB oracle. The per-query
    * plans union; the rank column is recomputed over the ≤ nq·k winners.
    */
  def rewriteSearchQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val qs = VectorSearch.querySet(spark, dir, 5).orderBy(col("qid")).collect()
    val per = qs.map(r => flatTopK(spark, path, r.getLong(0), r.getSeq[Float](1).toArray))
    val all = per.reduce(_ unionAll _)
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    all.withColumn("rank", row_number().over(w))
      .select(col("qid"), col("vec_id"), col("rank"), micro(col("sim")).as("sim_micro"))
      .orderBy(col("qid"), col("rank"))
  }

  /** SQL-first entry to the vector store: the clustered rows registered
    * as a datasource-backed catalog view (the `lake_events` pattern of
    * [[PartitionedStore.ensureSqlViews]]), so plain `spark.sql` over
    * `lake_vectors` plans through the SAME HadoopFsRelation the DataFrame
    * path reads — including [[graft.plans.AnnProbeRewrite]]'s store
    * detection, which keys on the relation's `rows` root + sibling
    * markers and is entry-surface-agnostic. Registration is
    * generation-keyed ([[SqlViews.ensureParquetView]]) so the view
    * tracks the current store content without re-paying schema
    * inference on every call.
    */
  def ensureSqlView(spark: SparkSession, dir: String): String = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    SqlViews.ensureParquetView(spark, "lake_vectors", s"$path/rows")
    path
  }

  /** The `lake_sql_ann` named query — the reference's client surface
    * (`Milvus/stream1.py:161-162` search-by-expression) for SQL users:
    * the NAIVE `ORDER BY dot(<literal qvec>, embedding) DESC … LIMIT k`
    * text over the `lake_vectors` view, one arm per standard query
    * vector. Nothing in the SQL mentions cells or probing — the
    * optimizer-time [[graft.plans.AnnProbeRewrite]] recognizes each
    * arm's sorted-limit shape over the store layout and injects the
    * static `cell_id IN (<nprobe nearest cells>)` filter, so the SQL
    * user gets the partition-pruned probed plan (`PartitionFilters`
    * INSET on every arm's scan, spec-asserted) exactly as the DataFrame
    * path does. Row-identical to `knn_ivf`, replayed by the SAME
    * exported-store DuckDB oracle. Query vectors are inlined as double
    * literals narrowed to float — Float.toString round-trips through a
    * double literal bit-exactly.
    */
  def sqlAnnQuery(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    ensureSqlView(spark, dir)
    val qs = VectorSearch.querySet(spark, dir, 5).orderBy(col("qid")).collect()
    val arms = qs.map { r =>
      val qid = r.getLong(0)
      val vec = r.getSeq[Float](1).map(f => s"${f}D").mkString(", ")
      s"""(SELECT CAST($qid AS BIGINT) AS qid, vec_id,
         |        dot(CAST(array($vec) AS ARRAY<FLOAT>), embedding) AS sim
         | FROM lake_vectors WHERE vec_id <> $qid
         | ORDER BY sim DESC, vec_id LIMIT $k)""".stripMargin
    }
    spark.sql(
      s"""SELECT qid, vec_id,
         |       row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank,
         |       CAST(FLOOR(sim * 1000000.0D) AS BIGINT) AS sim_micro
         |FROM (${arms.mkString("\nUNION ALL\n")})
         |ORDER BY qid, rank""".stripMargin)
  }

  /** Radius (range) search over the persisted pruned index — the scale
    * path of [[graft.operators.VectorSearch.rangeSearch]]: probe the
    * nprobe nearest cells exactly as [[searchPruned]] does (static IN-list
    * `PartitionFilters` — unprobed cells' files are never read), then cut
    * on the integer micro radius instead of ranking top-k. No rank window
    * at all: selection stays a map-side filter over the pruned scan, so
    * per-query state never accumulates however many hits the radius
    * admits. Approximate exactly like FAISS IVF range_search: hits outside
    * probed cells are missed — the same nprobe recall dial.
    */
  def rangeSearchPruned(spark: SparkSession, path: String, queries: DataFrame,
                        thresholdMicro: Long = 200000L, nprobe: Int = 10): DataFrame =
    scoreProbed(spark, path, queries, nprobe)
      .withColumn("sim_micro", micro(col("sim")))
      .filter(col("sim_micro") >= thresholdMicro)
      .select(col("qid"), col("vec_id"), col("sim_micro"))
      .orderBy(col("qid"), col("sim_micro").desc, col("vec_id"))

  /** Range search over the persisted index as a named query. */
  def rangeQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    rangeSearchPruned(spark, path, VectorSearch.querySet(spark, dir, 5))
  }

  /** Index-health statistics — the `collection.num_entities` /
    * inverted-list-balance surface every vector DB exposes
    * (`Milvus/stream1.py:201,227,238` gates its loads on entity counts;
    * FAISS ops watch invlist imbalance because one hot cell serializes
    * probes). Per cell: entity count, key range, and integer-mean vector
    * norm (Σ floor(1e6·‖v‖) DIV n — fold-order-free). One map-combined
    * aggregation over the clustered layout; at 100 TB each partition
    * aggregates its own file split, no row ever moves except the ≤ nlist
    * partial buffers.
    */
  def statsQuery(spark: SparkSession, dir: String): DataFrame = {
    val path = defaultPath(dir)
    ensure(spark, dir, path)
    val (rows, _) = read(spark, path)
    rows
      .select(col("cell_id").cast("long").as("cell_id"), col("vec_id"),
        micro(norm2(col("embedding"))).as("nm"))
      .groupBy(col("cell_id"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec_id"),
        max(col("vec_id")).as("max_vec_id"),
        expr("sum(nm) DIV count(1)").as("mean_norm_micro"))
      .orderBy(col("cell_id"))
  }
}
