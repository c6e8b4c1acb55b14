package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSearch
import graft.plans.KnnJoinApi

/** The custom KnnJoin operator (LogicalPlan + Strategy + SparkPlan) must
  * agree exactly with the declarative crossJoin+window formulation, plan
  * through KnnJoinExec, and respect its bounds.
  */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  test("physical kNN equals the declarative window top-k, cell for cell") {
    val phys = VectorSearch.knnExactPhysical(spark, sfDir, k = 5, nq = 5)
      .collect().map(_.toSeq).toSeq
    val decl = VectorSearch.knnExact(spark, sfDir, k = 5, nq = 5)
      .collect().map(_.toSeq).toSeq
    assert(phys == decl)
  }

  test("the plan goes through KnnJoinExec") {
    val df = VectorSearch.knnExactPhysical(spark, sfDir)
    df.collect() // AQE finalizes the physical plan on execution
    // the node class prints with the Exec suffix stripped, and AQE query
    // stages are leaves to `exists` — check the rendered physical tree
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("KnnJoin "), p.take(2000))
    assert(!p.contains("!KnnJoin"), "node still flagged with missing input: " + p.take(2000))
  }

  test("mismatched vector dimensions fail fast instead of truncating") {
    val base = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val q = VectorSearch.querySet(spark, sfDir, 2)
      .select($"qid", slice($"qvec", 1, 8).as("qvec")) // 8-dim vs the 64-dim base
    val ex = intercept[Exception] {
      KnnJoinApi.knnJoin(spark, q, base, k = 3).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).flatMap(c => Option(c.getMessage)).exists(_.contains("dimension mismatch")),
      s"expected a dimension-mismatch failure, got: $ex")
  }

  test("k larger than the base returns all non-self rows") {
    val base = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val q = VectorSearch.querySet(spark, sfDir, 2)
    val n = base.count()
    val hits = KnnJoinApi.knnJoin(spark, q, base, k = n.toInt + 10)
    assert(hits.count() == 2L * (n - 1))
  }

  test("excludeSelf=false keeps the self-match at rank 1 with sim≈1") {
    val base = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val q = VectorSearch.querySet(spark, sfDir, 3)
    val hits = KnnJoinApi.knnJoin(spark, q, base, k = 1, excludeSelf = false)
    val top = hits.select($"qid", $"vec_id", $"sim").collect()
    assert(top.forall(r => r.getLong(0) == r.getLong(1)), "self is nearest")
    assert(top.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-5))
  }
}
