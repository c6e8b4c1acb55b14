package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch

/** V4–V6/O2/J1: exact kNN is the oracle; IVF and LSH are approximate paths
  * whose recall is measured against it (the FAISS recall contract:
  * nprobe → nlist ⇒ recall → 1, `FAISS/PlainDemo/pipeline.py:254-263`).
  */
class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"qid", $"vec_id").as[(Long, Long)].collect().toSet

  test("knnExact with k=n returns every non-self row per query") {
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val all = VectorSearch.knnExact(spark, sfDir, k = n, nq = 2)
    assert(all.count() == 2L * (n - 1))
  }

  test("k and nprobe clamp at the edges like the reference guards") {
    // pipeline+ui.py:227-230: actual_nprobe = min(nprobe, nlist),
    // actual_k = min(k, ntotal). The window-rank formulation realizes
    // exactly these clamped semantics — over-asking never errors and
    // never fabricates rows.
    val n = Tables.embeddings(spark, sfDir).count()
    val overK = VectorSearch.knnExact(spark, sfDir, k = (10 * n).toInt, nq = 2)
    assert(overK.count() == 2L * (n - 1), "k > ntotal clamps to every non-self row")
    val e = Tables.embeddings(spark, sfDir)
    val centroids = VectorSearch.kmeansFit(e, 4, iters = 2).cache()
    val assigned = VectorSearch.assignCells(e, centroids).cache()
    val q = VectorSearch.querySet(spark, sfDir, 3)
    val overProbe = VectorSearch.ivfSearch(assigned, centroids, q, k = 5, nprobe = 999)
    val allProbe = VectorSearch.ivfSearch(assigned, centroids, q, k = 5, nprobe = 4)
    assert(hits(overProbe) == hits(allProbe), "nprobe > nlist clamps to probing every cell")
  }

  test("knnExact ranks are contiguous and sims non-increasing per query") {
    val res = VectorSearch.knnExact(spark, sfDir, k = 5, nq = 5)
      .select($"qid", $"rank", $"sim_micro").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    res.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).map(_.toLong))
      assert(sorted.map(_._3).sliding(2).forall(s => s.length < 2 || s(0) >= s(1)))
    }
  }

  test("IVF search with nprobe=nlist equals exact search") {
    val e = Tables.embeddings(spark, sfDir)
    val nlist = 4
    val centroids = VectorSearch.kmeansFit(e, nlist, iters = 2).cache()
    val assigned = VectorSearch.assignCells(e, centroids).cache()
    assert(assigned.count() == e.count(), "assignment is total")
    val q = VectorSearch.querySet(spark, sfDir, 5)
    val probedAll = VectorSearch.ivfSearch(assigned, centroids, q, k = 5, nprobe = nlist)
    val exact = VectorSearch.knnExact(spark, sfDir, k = 5, nq = 5)
    assert(hits(probedAll) == hits(exact), "nprobe=nlist ⇒ recall 1")
  }

  test("IVF recall at nprobe=2 of 4 cells is reasonable") {
    val e = Tables.embeddings(spark, sfDir)
    val centroids = VectorSearch.kmeansFit(e, 4, iters = 2).cache()
    val assigned = VectorSearch.assignCells(e, centroids).cache()
    val q = VectorSearch.querySet(spark, sfDir, 5)
    val approx = hits(VectorSearch.ivfSearch(assigned, centroids, q, k = 5, nprobe = 2))
    val exact = hits(VectorSearch.knnExact(spark, sfDir, k = 5, nq = 5))
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for half the cells probed")
  }

  test("LSH candidates are a subset of exact top-k ordering semantics") {
    // every LSH hit must carry the same sim as exact scoring gives that pair
    val lsh = VectorSearch.knnLsh(spark, sfDir, k = 3, nq = 5, bits = 4)
      .select($"qid", $"vec_id", $"sim_micro").as[(Long, Long, Long)].collect().toMap2
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val exactAll = VectorSearch.knnExact(spark, sfDir, k = n, nq = 5)
      .select($"qid", $"vec_id", $"sim_micro").as[(Long, Long, Long)].collect().toMap2
    lsh.foreach { case (k2, sim) => assert(exactAll(k2) == sim, s"sim mismatch at $k2") }
  }

  private implicit class Tup3Ops(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] = rows.map(r => ((r._1, r._2), r._3)).toMap
  }
}
