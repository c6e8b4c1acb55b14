package graft

import org.apache.spark.sql.catalyst.plans.logical.Filter
import graft.operators.VectorSearch
import graft.sources.IndexStore

/** AnnProbeRewrite (SURVEY.md §4 stretch goal): the naive
  * "ORDER BY distance LIMIT k" flat query over the persisted clustered
  * store must be rewritten into the probed form — a static cell_id IN-list
  * that reaches the parquet scan as PartitionFilters — and must return
  * rows identical to the explicitly-probed `knn_ivf` path.
  */
class AnnRewriteSpec extends SparkSpec {

  private lazy val path: String = {
    val p = IndexStore.defaultPath(sfDir)
    IndexStore.ensure(spark, sfDir, p)
    p
  }

  private def firstQuery = VectorSearch.querySet(spark, sfDir, 1).collect().head

  test("naive flat top-k over the store is rewritten to a probed cell_id filter") {
    val q = firstQuery
    val df = IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
    val cellFilters = df.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.references.exists(_.name == "cell_id") => f
    }
    assert(cellFilters.nonEmpty, df.queryExecution.optimizedPlan.toString)
    // and the filter prunes the clustered layout at the source
    val physical = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell_id".r.findFirstIn(physical).nonEmpty, physical)
  }

  test("rewritten flat query is row-identical to the explicit probed search (knn_ivf)") {
    val rewritten = IndexStore.rewriteSearchQuery(spark, sfDir).collect().toSeq
    val probed = IndexStore.searchQuery(spark, sfDir).collect().toSeq
    assert(rewritten == probed)
  }

  test("SQL route: every union arm of the lake_vectors query gets the probed INSET") {
    val df = IndexStore.sqlAnnQuery(spark, sfDir)
    // the rewrite fires at optimization time on each arm's sorted-limit,
    // even with the outer sim_micro projection pushed between limit and sort
    val cellFilters = df.queryExecution.optimizedPlan.collect {
      case f: Filter if f.condition.references.exists(_.name == "cell_id") => f
    }
    assert(cellFilters.size == 5, df.queryExecution.optimizedPlan.toString)
    val physical = df.queryExecution.executedPlan.toString
    val insets = "PartitionFilters: \\[[^\\]]*cell_id[^\\]]* IN ".r
      .findAllIn(physical).length
    assert(insets == 5, physical.take(4000))
  }

  test("SQL route is row-identical to the explicit probed search (knn_ivf)") {
    val viaSql = IndexStore.sqlAnnQuery(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val probed = IndexStore.searchQuery(spark, sfDir).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(viaSql == probed)
  }

  test("disabling the conf restores the exact flat scan") {
    spark.conf.set("spark.graft.ann.rewrite.enabled", "false")
    try {
      val q = firstQuery
      val df = IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
      val cellFilters = df.queryExecution.optimizedPlan.collect {
        case f: Filter if f.condition.references.exists(_.name == "cell_id") => f
      }
      assert(cellFilters.isEmpty, df.queryExecution.optimizedPlan.toString)
    } finally spark.conf.set("spark.graft.ann.rewrite.enabled", "true")
  }

  test("repeated planning over the same store does zero filesystem detection") {
    val q = firstQuery
    def planOnce(): Unit = {
      val df = IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
      df.queryExecution.optimizedPlan // force the optimizer pass
    }
    planOnce() // warm: may pay the one-time detection (exists + marker read)
    val before = graft.plans.AnnProbeRewrite.fsDetectCalls.get()
    planOnce(); planOnce()
    assert(graft.plans.AnnProbeRewrite.fsDetectCalls.get() == before,
      "store detection must be memoized — no per-plan filesystem calls")
  }

  test("a rebuild's fresh _build_id invalidates the memoized detection") {
    val q = firstQuery
    IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
      .queryExecution.optimizedPlan // populate the detection cache
    val before = graft.plans.AnnProbeRewrite.fsDetectCalls.get()
    graft.plans.AnnProbeRewrite.invalidate(path) // what stampBuildId does
    IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
      .queryExecution.optimizedPlan
    assert(graft.plans.AnnProbeRewrite.fsDetectCalls.get() == before + 1,
      "invalidation must force exactly one re-detection on the next plan")
  }

  test("the nprobe conf is the recall dial: nprobe = nlist makes the flat query exact") {
    spark.conf.set("spark.graft.ann.rewrite.nprobe", "1000000")
    try {
      val q = firstQuery
      val got = IndexStore.flatTopK(spark, path, q.getLong(0), q.getSeq[Float](1).toArray)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val exact = VectorSearch.knnExact(spark, sfDir, k = 5, nq = 1)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == exact)
    } finally spark.conf.unset("spark.graft.ann.rewrite.nprobe")
  }
}
