package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantize, VectorSearch}

/** Scalar quantization: error bound, code-space search recall, and the
  * integer-dot codegen kernel's equivalence to the HOF fold.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("reconstruction error is bounded by the quantization step") {
    // symmetric 8-bit: per-component error <= 1/254, so ||v-v̂||₂ <= √dim/254
    val dim = 64
    val bound = math.sqrt(dim) / 254.0 + 1e-9
    val worst = Quantize.quantizeQuery(spark, sfDir)
      .agg(max($"err_micro")).as[Long].head()
    assert(worst <= (bound * 1e6).toLong + 1, s"err_micro $worst exceeds bound")
  }

  test("codegen integer dot == HOF integer fold on codes") {
    val base = Tables.embeddings(spark, sfDir)
      .select($"vec_id", Quantize.quantize($"embedding").as("code")).limit(100)
    val a = base.select($"vec_id".as("ia"), $"code".as("ca"))
    val b = base.select($"vec_id".as("ib"), $"code".as("cb"))
    val diff = a.crossJoin(b).filter($"ia" < $"ib").limit(2000)
      .select(
        Quantize.codeDot($"ca", $"cb").as("fast"),
        aggregate(zip_with($"ca", $"cb", (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("quantized search preserves most of the exact top-k") {
    val exact = VectorSearch.knnExact(spark, sfDir, k = 5, nq = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val quant = Quantize.knnQuantized(spark, sfDir, k = 5, nq = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"8-bit quantization recall $recall too low")
  }
}
