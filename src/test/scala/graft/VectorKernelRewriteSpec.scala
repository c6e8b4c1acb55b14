package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The optimizer rule (GraftExtensions → VectorKernelRewrite) must rewrite
  * user-written HOF vector folds into the codegen kernels, without changing
  * values (the kernels are bit-identical folds).
  */
class VectorKernelRewriteSpec extends SparkSpec {
  import spark.implicits._

  test("HOF dot product is strength-reduced to DotProductFloat") {
    val e = Tables.embeddings(spark, sfDir).limit(10)
    val pair = e.select($"vec_id", $"embedding".as("a"))
      .crossJoin(e.select($"embedding".as("b")).limit(1))
    val hof = pair.select(dotHof($"a", $"b").as("s"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.contains("dotproductfloat"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("HOF squared-distance is strength-reduced to L2DistanceSqFloat") {
    val e = Tables.embeddings(spark, sfDir).limit(10)
    val pair = e.select($"embedding".as("a"))
      .crossJoin(e.select($"embedding".as("b")).limit(1))
    val optimized = pair.select(l2DistanceSqHof($"a", $"b").as("s"))
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("l2distancesqfloat"), optimized)
  }

  test("rewritten plans produce the same values as the explicit kernels") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val q = e.limit(1).select($"embedding".as("b"))
    val pair = e.select($"vec_id", $"embedding".as("a")).crossJoin(q)
    val viaHof = pair.select($"vec_id", dotHof($"a", $"b").as("s"))
      .orderBy($"vec_id").as[(Long, Double)].collect().toSeq
    val viaKernel = pair.select($"vec_id", dot($"a", $"b").as("s"))
      .orderBy($"vec_id").as[(Long, Double)].collect().toSeq
    assert(viaHof == viaKernel)
  }

  test("non-matching folds are left alone") {
    // a fold whose zero is 1.0 must NOT be rewritten
    val e = Tables.embeddings(spark, sfDir).limit(5)
    val other = e.select(aggregate(
      zip_with(vecD($"embedding"), vecD($"embedding"), (x, y) => x * y),
      lit(1.0), (acc, x) => acc + x).as("s"))
    val optimized = other.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("dotproductfloat"), optimized)
  }
}
