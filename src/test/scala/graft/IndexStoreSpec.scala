package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.sources.IndexStore

/** The persisted clustered index: layout, partition pruning, and
  * search-result agreement with the in-memory path.
  */
class IndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IndexStore.write(spark, sfDir, p)
    p
  }

  test("clustered layout: one directory per cell, all rows present") {
    val dirs = new java.io.File(s"$path/rows").listFiles()
      .filter(_.getName.startsWith("cell_id=")).length
    assert(dirs > 1, "expected multiple cell partitions")
    val (rows, _) = IndexStore.read(spark, path)
    assert(rows.count() == Tables.embeddings(spark, sfDir).count())
  }

  test("cell filter prunes partitions at the scan") {
    val (rows, _) = IndexStore.read(spark, path)
    val p = rows.filter($"cell_id" === 3).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("cell_id"), p.take(2000))
  }

  test("search over the persisted index returns k hits per query") {
    val q = VectorSearch.querySet(spark, sfDir, 3)
    val hits = IndexStore.search(spark, path, q, k = 5, nprobe = 10)
    val perQ = hits.groupBy($"qid").count().select($"count").as[Long].collect()
    assert(perQ.forall(_ == 5L))
  }

  test("pruned search result == unpruned persisted search result") {
    val q = VectorSearch.querySet(spark, sfDir, 3)
    val a = IndexStore.search(spark, path, q, k = 5, nprobe = 10).collect().toSeq
    val b = IndexStore.searchPruned(spark, path, q, k = 5, nprobe = 10).collect().toSeq
    assert(a == b, "pruning the scan must not change the result set")
  }

  test("pruned range search: subset of exact range, exact at nprobe=nlist, radius respected") {
    val q = VectorSearch.querySet(spark, sfDir, 5)
    val thr = 150000L
    val pruned = IndexStore.rangeSearchPruned(spark, path, q, thresholdMicro = thr, nprobe = 2)
      .select($"qid", $"vec_id", $"sim_micro").cache()
    assert(pruned.filter($"sim_micro" < thr).count() == 0, "radius respected")
    // exact range over the full base (the unprobed reference)
    val exact = VectorSearch.rangeSearch(spark, sfDir, nq = 5, thresholdMicro = thr)
      .select($"qid", $"vec_id", $"sim_micro")
    assert(pruned.exceptAll(exact).count() == 0, "probing can only MISS hits, never invent them")
    // probing every cell reproduces the exact range set
    val nlist = IndexStore.read(spark, path)._2.count().toInt
    val all = IndexStore.rangeSearchPruned(spark, path, q, thresholdMicro = thr, nprobe = nlist)
      .select($"qid", $"vec_id", $"sim_micro")
    assert(all.exceptAll(exact).count() == 0 && exact.exceptAll(all).count() == 0)
    pruned.unpersist(blocking = false)
  }

  test("index stats: per-cell counts partition the base, norms are ~1 for the normalized corpus") {
    val (rows, centroids) = IndexStore.read(spark, path)
    val stats = rows
      .select($"cell_id".cast("long").as("cell_id"), $"vec_id",
        graft.functions.VectorFunctions.micro(
          graft.functions.VectorFunctions.norm2($"embedding")).as("nm"))
      .groupBy($"cell_id")
      .agg(count(lit(1)).as("n_vecs"), expr("sum(nm) DIV count(1)").as("mean_norm_micro"))
      .collect()
    assert(stats.map(_.getAs[Long]("n_vecs")).sum == Tables.embeddings(spark, sfDir).count())
    assert(stats.length.toLong == rows.select($"cell_id").distinct().count())
    // the corpus is L2-normalized: every cell's mean norm is 1.0 ± 1 ulp-ish
    assert(stats.forall(r => math.abs(r.getAs[Long]("mean_norm_micro") - 1000000L) <= 2L),
      stats.map(_.getAs[Long]("mean_norm_micro")).mkString(","))
  }

  test("pruned search scan carries a static PartitionFilters IN-list on cell_id") {
    val q = VectorSearch.querySet(spark, sfDir, 3)
    val plan = IndexStore.searchPruned(spark, path, q, k = 5, nprobe = 10)
      .queryExecution.executedPlan.toString
    // the rows scan must carry the probed in-list (planned as INSET),
    // i.e. prune unprobed cells' directories before reading a byte
    assert(plan.contains("PartitionFilters") && plan.contains("INSET"),
      "expected an INSET partition filter on cell_id\n" + plan.take(3000))
  }

  test("tombstoned search: no deleted id surfaces, k fills from live rows, pruning kept") {
    val out = IndexStore.searchTombstoned(spark, sfDir)
    val rows = out.select($"qid".as[Long], $"vec_id".as[Long], $"rank".as[Long]).collect()
    assert(rows.forall(_._2 % 17 != 3), "a tombstoned id surfaced in the top-k")
    // dense 1..k ranks per query: the anti-join sits BELOW the rank
    // window, so k fills from live rows instead of leaving gaps
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, s"ranks not dense for qid=$q")
      assert(rs.length == 5, s"qid=$q returned ${rs.length} < k hits")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("INSET"),
      "tombstone filter must not defeat static cell pruning\n" + plan.take(3000))
  }

  test("recall sweep: monotone in nprobe, exact at nprobe=nlist, agrees with the per-query report") {
    val rows = IndexStore.recallSweep(spark, sfDir)
      .select($"nprobe".as[Long], $"n_found".as[Long], $"n_exact".as[Long],
        $"recall_micro".as[Long]).collect().toSeq
    assert(rows.nonEmpty && rows.map(_._1) == rows.map(_._1).sorted, "levels ascend")
    // recall@k is monotone in the probe level: candidates(L1) ⊆ candidates(L2)
    assert(rows.map(_._4).sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      s"recall not monotone: $rows")
    assert(rows.last._4 == 1000000L, "probing every cell must recover exact top-k")
    assert(rows.map(_._3).distinct.size == 1, "n_exact constant across levels")
    // cross-check vs the per-query report at the shared nprobe=10 level
    val reportFound = IndexStore.recallReport(spark, sfDir)
      .select($"n_found".as[Long]).collect().sum
    val sweepAt10 = rows.find(_._1 == 10L).map(_._2)
    assert(sweepAt10.contains(reportFound),
      s"sweep n_found at nprobe=10 ($sweepAt10) != report total ($reportFound)")
  }

  test("mrr eval: perfect at full probe, rr consistent with rank, misses are zero") {
    val full = IndexStore.mrrReport(spark, sfDir, k = 10, nq = 5, nprobe = 1000)
      .collect()
    assert(full.length == 5)
    assert(full.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1000000L),
      s"full probe must rank the true NN first: ${full.mkString(",")}")
    val probed = IndexStore.mrrReport(spark, sfDir).collect()
    assert(probed.forall { r =>
      val (rank, rr) = (r.getLong(1), r.getLong(2))
      if (rank > 0) rr == 1000000L / rank else rr == 0L
    }, "rr_micro must be 10^6 DIV rank (0 on a miss)")
  }

  test("rebuild compacts tombstones: live rows only, retrained cells, fresh build id") {
    val path = IndexStore.defaultPath(sfDir)
    IndexStore.ensure(spark, sfDir, path)
    val out = s"/tmp/graft_rebuild_${System.nanoTime()}"
    try {
      val tombs = Tables.embeddings(spark, sfDir)
        .filter($"vec_id" % 17 === 3).select($"vec_id")
      IndexStore.rebuild(spark, path, out, tombs)
      val (rows, cents) = IndexStore.read(spark, out)
      assert(rows.filter($"vec_id" % 17 === 3).count() == 0, "tombstoned rows survived compaction")
      val expected = Tables.embeddings(spark, sfDir).count() - tombs.count()
      assert(rows.count() == expected, "live rows lost or duplicated in the rebuild")
      assert(IndexStore.buildId(out).nonEmpty && IndexStore.buildId(out) != IndexStore.buildId(path),
        "rebuild must stamp a fresh build id")
      // retrained store serves full top-k from live rows only
      val hits = IndexStore.search(spark, out, graft.operators.VectorSearch.querySet(spark, sfDir, 5))
        .select($"qid".as[Long], $"vec_id".as[Long], $"rank".as[Long]).collect()
      assert(hits.forall(_._2 % 17 != 3))
      hits.groupBy(_._1).foreach { case (q, rs) =>
        assert(rs.length == 5 && rs.map(_._3).sorted.toSeq == (1L to 5L), s"qid=$q top-k malformed")
      }
      assert(cents.count() >= 1)
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(out))
  }

  test("auto-tune picks the smallest measured nprobe meeting the recall target") {
    val target = 900000L
    val curve = IndexStore.recallSweep(spark, sfDir)
      .select($"nprobe".as[Long], $"recall_micro".as[Long]).collect().toSeq
    val feasible = curve.filter(_._2 >= target).map(_._1)
    assert(feasible.nonEmpty, "nprobe = nlist has recall 1.0 by construction")
    val tuned = IndexStore.autoTuneSearch(spark, sfDir).cache()
    val np = tuned.select($"nprobe").distinct().as[Long].collect()
    assert(np.toSeq == Seq(feasible.min), s"chose ${np.toSeq}, measured curve $curve")
    // the tuned result IS the pruned search at the chosen knob
    val direct = IndexStore.searchPruned(spark, IndexStore.defaultPath(sfDir),
      graft.operators.VectorSearch.querySet(spark, sfDir, 5), 5, feasible.min.toInt)
    val got = tuned.drop("nprobe")
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
    // no cheaper measured level would have met the target
    curve.filter(_._1 < feasible.min).foreach { case (l, rec) =>
      assert(rec < target, s"level $l already met the target; min was not minimal")
    }
    tuned.unpersist(blocking = false)
  }

  test("absorb: new vectors land in their centroid cells, searchable with no rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-absorbstore").toString
    val store = s"$tmp/store"
    try {
      val e = Tables.embeddings(spark, sfDir)
      val base = e.filter($"vec_id" % 2 === 0)
      val extra = e.filter($"vec_id" % 2 === 1 && $"vec_id" < 100)
      IndexStore.writeFrom(base, store)
      val id1 = IndexStore.buildId(store)
      IndexStore.absorb(spark, store, extra)
      assert(IndexStore.buildId(store) != id1,
        "absorb must stamp a fresh build id (PQ/planner cascade)")
      val (rows, centroids) = IndexStore.read(spark, store)
      assert(rows.count() == base.count() + extra.count(), "append, not overwrite")
      // absorbed rows sit in the cell the CURRENT centroids assign — the
      // invariant that makes probed search find them without re-clustering
      val stored = rows.join(extra.select($"vec_id"), "vec_id")
        .select($"vec_id", $"cell_id".cast("long").as("got_cell"))
      val expected = graft.operators.VectorSearch.assignCells(extra, centroids)
        .select($"vec_id", $"cell_id".cast("long").as("want_cell"))
      assert(stored.join(expected, "vec_id")
        .filter($"got_cell" =!= $"want_cell").count() == 0)
      // a probed query AT an absorbed vector must score top-1 at exactly
      // the vector's self-similarity (itself, or an exact twin)
      import graft.functions.VectorFunctions
      val queries = extra.select((-$"vec_id").as("qid"), $"embedding".as("qvec"))
      val selfSim = extra.select((-$"vec_id").as("qid"),
        VectorFunctions.micro(VectorFunctions.dot($"embedding", $"embedding")).as("want_micro"))
      val bad = IndexStore.searchPruned(spark, store, queries, k = 1)
        .filter($"rank" === 1)
        .join(selfSim, "qid")
        .filter($"sim_micro" =!= $"want_micro").count()
      assert(bad == 0, "every absorbed vector must be found at its self-similarity")
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(tmp))
  }

  test("maintain absorb branch: serving store keeps the day-1 centroids, all rows land") {
    val report = IndexStore.maintainQuery(spark, sfDir, tauMicroSq = Long.MaxValue)
    val decisions = report.select($"decision").distinct().as[String].collect()
    assert(decisions.toSeq == Seq("absorb"), "τ=∞ must always absorb")
    val maintPath = IndexStore.defaultPath(sfDir) + "_maint"
    val (rows, centroids) = IndexStore.read(spark, maintPath)
    val e = Tables.embeddings(spark, sfDir)
    assert(rows.count() == e.count(), "absorb must end serving every vector")
    // centroids are the ones trained on the even half alone: re-deriving
    // that training must reproduce them exactly (absorb never re-trains)
    val (_, wantCentroids) = graft.operators.VectorSearch.ivfBuildFrom(
      e.filter($"vec_id" % 2 === 0))
    val got = centroids.select($"cell_id".cast("long"), $"centroid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val want = wantCentroids.select($"cell_id".cast("long"), $"centroid").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got == want, "absorb branch must not move the trained centroids")
    val n = report.select($"rows_after").distinct().as[Long].collect()
    assert(n.toSeq == Seq(e.count()))
  }

  test("maintain rebuild branch: serving store is re-trained over live ∪ incoming") {
    val report = IndexStore.maintainQuery(spark, sfDir, tauMicroSq = 0L)
    val decisions = report.select($"decision").distinct().as[String].collect()
    assert(decisions.toSeq == Seq("rebuild"), "τ=0 must always rebuild")
    val rbPath = IndexStore.defaultPath(sfDir) + "_maint_rb"
    assert(IndexStore.buildId(rbPath).nonEmpty, "rebuild must stamp the new store")
    val (rows, centroids) = IndexStore.read(spark, rbPath)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.count() == n, "rebuild must serve every vector")
    // re-trained quantizer: nlist follows the FULL corpus size, the
    // signature of a re-train (the absorb branch keeps the half-corpus's)
    val wantNlist = math.max(1, math.min(100, math.sqrt(n.toDouble).toInt))
    assert(centroids.count() == wantNlist,
      s"expected re-trained nlist=$wantNlist, got ${centroids.count()}")
    // every row sits in the cell the NEW centroids assign
    val mis = rows.select($"vec_id", $"cell_id".cast("long").as("got"))
      .join(graft.operators.VectorSearch.assignCells(rows.drop("cell_id"), centroids)
        .select($"vec_id", $"cell_id".cast("long").as("want")), "vec_id")
      .filter($"got" =!= $"want").count()
    assert(mis == 0)
  }

  test("ensure rebuilds when the source data is regenerated, and only then") {
    // The driver rewrites the testdata between rounds; a store keyed only
    // on artifact EXISTENCE would keep serving the previous corpus's
    // clustering. The `_src_fp_*` content marker must trigger exactly one
    // rebuild per source generation.
    val tmp = java.nio.file.Files.createTempDirectory("graft-fp").toString
    val srcDir = s"$tmp/data"; new java.io.File(srcDir).mkdirs()
    def writeEmbeddings(df: org.apache.spark.sql.DataFrame): Unit = {
      val staging = s"$tmp/stage"
      df.coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$srcDir/embeddings.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.streaming.StreamOps.rmTree(new java.io.File(staging))
    }
    val store = s"$tmp/store"
    try {
      val full = Tables.embeddings(spark, sfDir)
      writeEmbeddings(full)
      IndexStore.ensure(spark, srcDir, store)
      val id1 = IndexStore.buildId(store)
      assert(id1.nonEmpty, "first ensure builds and stamps")
      IndexStore.ensure(spark, srcDir, store)
      assert(IndexStore.buildId(store) == id1, "unchanged source: ensure must be a no-op")
      // "regenerate" the corpus: same table, half the rows
      writeEmbeddings(full.filter($"vec_id" % 2 === 0))
      IndexStore.ensure(spark, srcDir, store)
      assert(IndexStore.buildId(store) != id1, "regenerated source must force a rebuild")
      val (rows, _) = IndexStore.read(spark, store)
      assert(rows.count() == full.filter($"vec_id" % 2 === 0).count(),
        "rebuilt store must index the NEW corpus")
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(tmp))
  }

  test("bounded tombstone broadcast: hinted within the bound, shuffled past it, rows identical") {
    // Every tombstone anti-join in the engine routes through
    // Tables.boundedBroadcast: real deletes (a sliver) get the broadcast
    // hint; a corpus-proportional bulk delete must NOT force a driver-side
    // hash relation — the plan degrades to a shuffled anti-join and the
    // result is unchanged.
    // Auto-broadcast is disabled inside this test so the plan reflects the
    // HINT alone: a 10k-row synthetic set is still under the size threshold
    // and the planner would (correctly) volunteer a broadcast from real
    // stats — the contract under test is only that boundedBroadcast stops
    // FORCING one past the bound, leaving the choice to the planner/AQE.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val emb = Tables.embeddings(spark, sfDir).select($"vec_id")
      // starts mid-corpus so the anti-join keeps a non-empty survivor set
      val bulk = spark.range(250, Tables.MaxInlineIds + 750L).toDF("vec_id")
      val hinted = emb.join(Tables.boundedBroadcast(bulk, bound = Long.MaxValue),
        Seq("vec_id"), "left_anti")
      val degraded = emb.join(Tables.boundedBroadcast(bulk), Seq("vec_id"), "left_anti")
      val hintedPlan = hinted.queryExecution.executedPlan.toString
      val degradedPlan = degraded.queryExecution.executedPlan.toString
      assert(hintedPlan.contains("BroadcastHashJoin"),
        s"within-bound set must carry the broadcast hint:\n${hintedPlan.take(1500)}")
      assert(!degradedPlan.contains("BroadcastHashJoin"),
        s"past-bound set must not be forced into a broadcast:\n${degradedPlan.take(1500)}")
      assert(degradedPlan.contains("SortMergeJoin") || degradedPlan.contains("ShuffledHashJoin"),
        s"past-bound set must shuffle:\n${degradedPlan.take(1500)}")
      val a = hinted.collect().map(_.getLong(0)).sorted.toSeq
      val b = degraded.collect().map(_.getLong(0)).sorted.toSeq
      assert(a == b && a.nonEmpty, "join strategy must never change the result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("layout compaction: fragmented absorb cells compact to the file target with rows conserved") {
    val out = IndexStore.layoutCompactQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_files") <= 1L),
      s"every cell must compact to the target, got ${out.map(_.getAs[Long]("n_files")).max}")
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum == n,
      "compaction must conserve every row")
    assert(out.head.getAs[Long]("corpus_rows") == n)
    // the compacted store still serves: probed search returns full ranks
    val work = IndexStore.defaultPath(sfDir) + "_plc"
    val q = Tables.embeddings(spark, sfDir).filter(org.apache.spark.sql.functions.col("vec_id") < 3)
      .select(org.apache.spark.sql.functions.col("vec_id").as("qid"),
        org.apache.spark.sql.functions.col("embedding").as("qvec"))
    assert(IndexStore.searchPruned(spark, work, q, 3, 10).count() == 9)
  }
}
