package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The codegen'd vector kernels must be BIT-identical to the higher-order
  * function formulations (same left-to-right double folds) — that identity
  * is what lets the DuckDB oracle mirror them with list_reduce.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot == HOF dot, bit for bit, on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val a = e.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = e.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib").limit(5000)
    val diff = pairs.select(
      dot($"va", $"vb").as("fast"),
      dotHof($"va", $"vb").as("ref"),
      l2DistanceSq($"va", $"vb").as("fast2"),
      l2DistanceSqHof($"va", $"vb").as("ref2"),
      norm2($"va").as("fastn"),
      norm2Hof($"va").as("refn"))
      .filter($"fast" =!= $"ref" || $"fast2" =!= $"ref2" || $"fastn" =!= $"refn")
    assert(diff.count() == 0, "codegen and HOF kernels diverged")
  }

  test("codegen kernels survive both codegen and interpreted paths") {
    val v1 = Seq((Array(1.5f, 2.5f, -3f), Array(2f, 3f, 1f))).toDF("a", "b")
    val row = v1.select(dot($"a", $"b"), l2Distance($"a", $"b"), norm2($"a")).head()
    assert(row.getDouble(0) == 1.5 * 2 + 2.5 * 3 + (-3.0))
    assert(math.abs(row.getDouble(2) - math.sqrt(1.5 * 1.5 + 2.5 * 2.5 + 9.0)) < 1e-12)
  }

  test("null inputs propagate null") {
    val df = Seq((Some(Array(1f, 2f)), Option.empty[Array[Float]])).toDF("a", "b")
    val r = df.select(dot($"a", $"b"), norm2($"b")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("mismatched vector lengths fail fast instead of truncating") {
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val ex = intercept[Exception] { df.select(dot($"a", $"b")).head() }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(x => String.valueOf(x.getMessage)))
        .mkString(" | ")
    assert(rootMsg(ex).contains("dimension mismatch"))
    val ex2 = intercept[Exception] { df.select(l2DistanceSq($"a", $"b")).head() }
    assert(rootMsg(ex2).contains("dimension mismatch"))
  }
}
