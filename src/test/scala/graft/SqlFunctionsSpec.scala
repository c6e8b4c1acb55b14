package graft

import org.apache.spark.sql.functions._
import graft.expressions.{DotProductFloat, L2NormalizeFloat}
import graft.functions.VectorFunctions

/** The injectFunction SQL surface: `spark.sql("SELECT dot(a,b) …")` must
  * reach the SAME codegen Catalyst expressions as the Scala API — never a
  * UDF — and agree bit-for-bit with the DataFrame formulations.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def emb() = {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_fn_spec")
    spark.table("emb_fn_spec")
  }

  test("SQL dot() plans to the DotProductFloat codegen kernel under WholeStageCodegen, not a UDF") {
    emb()
    val df = spark.sql("SELECT dot(embedding, embedding) AS d FROM emb_fn_spec")
    val opt = df.queryExecution.optimizedPlan
    assert(opt.expressions.exists(_.exists(_.isInstanceOf[DotProductFloat])),
      opt.toString.take(2000))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("ScalaUDF") && !phys.contains("BatchEvalPython"),
      phys.take(2000))
    // the "*(n)" prefix is executedPlan.toString's whole-stage-codegen marker
    assert(phys.contains("*(1) Project [dotproductfloat"), phys.take(2000))
  }

  test("SQL l2_normalize() plans to the L2NormalizeFloat kernel") {
    emb()
    val opt = spark.sql("SELECT l2_normalize(embedding) AS u FROM emb_fn_spec")
      .queryExecution.optimizedPlan
    assert(opt.expressions.exists(_.exists(_.isInstanceOf[L2NormalizeFloat])),
      opt.toString.take(2000))
  }

  test("every SQL kernel is bit-identical to its DataFrame-API formulation") {
    val e = emb().limit(50).cache()
    e.createOrReplaceTempView("emb_fn_pair")
    val sqlSide = spark.sql(
      """SELECT a.vec_id,
        |       dot(a.embedding, b.embedding) AS d,
        |       dot_long(array(a.vec_id, 2L), array(3L, a.vec_id)) AS dl,
        |       l2_distance_sq(a.embedding, b.embedding) AS d2,
        |       l2_distance(a.embedding, b.embedding) AS dist,
        |       norm2(a.embedding) AS n,
        |       cosine_sim(a.embedding, b.embedding) AS c,
        |       l2_normalize(a.embedding) AS u
        |FROM emb_fn_pair a JOIN emb_fn_pair b ON b.vec_id = a.vec_id + 1""".stripMargin)
      .orderBy("vec_id").collect()
    val b = e.select(col("vec_id").as("bid"), col("embedding").as("vb"))
    val apiSide = e.join(b, b("bid") === e("vec_id") + 1)
      .select(e("vec_id"),
        VectorFunctions.dot(col("embedding"), col("vb")).as("d"),
        graft.expressions.VectorExpressions.dotL(
          array(col("vec_id"), lit(2L)), array(lit(3L), col("vec_id"))).as("dl"),
        VectorFunctions.l2DistanceSq(col("embedding"), col("vb")).as("d2"),
        VectorFunctions.l2Distance(col("embedding"), col("vb")).as("dist"),
        VectorFunctions.norm2(col("embedding")).as("n"),
        VectorFunctions.cosine(col("embedding"), col("vb")).as("c"),
        VectorFunctions.l2Normalize(col("embedding")).as("u"))
      .orderBy("vec_id").collect()
    assert(sqlSide.length == apiSide.length && sqlSide.nonEmpty)
    sqlSide.zip(apiSide).foreach { case (s, a) =>
      assert(s.getDouble(1) == a.getDouble(1), "dot")
      assert(s.getLong(2) == a.getLong(2), "dot_long")
      assert(s.getDouble(3) == a.getDouble(3), "l2_distance_sq")
      assert(s.getDouble(4) == a.getDouble(4), "l2_distance")
      assert(s.getDouble(5) == a.getDouble(5), "norm2")
      assert(s.getDouble(6) == a.getDouble(6), "cosine_sim")
      assert(s.getSeq[Float](7) == a.getSeq[Float](7), "l2_normalize")
    }
  }

  test("l2_normalize: unit norm on nonzero input, zero vector unchanged, wrong arity rejected") {
    val norms = spark.sql(
      "SELECT norm2(l2_normalize(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))) AS n")
      .as[Double].head()
    assert(math.abs(norms - 1.0) < 1e-6) // elements round through FLOAT
    val zero = spark.sql(
      "SELECT l2_normalize(array(CAST(0.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS u")
      .select(col("u")).head().getSeq[Float](0)
    assert(zero == Seq(0.0f, 0.0f), "zero vector must pass through unchanged")
    val err = intercept[Exception](spark.sql("SELECT dot(array(CAST(1.0 AS FLOAT)))").collect())
    assert(err.getMessage.contains("2 argument"), err.getMessage)
  }

  test("hamming64: popcount-of-xor over packed codes, identity zero, wrong arity rejected") {
    // 0b1011 vs 0b0110 differ in bits 0, 2, 3 — distance 3
    assert(spark.sql("SELECT hamming64(11L, 6L) AS h").as[Int].head() == 3)
    assert(spark.sql("SELECT hamming64(-1L, 0L) AS h").as[Int].head() == 64)
    assert(spark.sql("SELECT hamming64(42L, 42L) AS h").as[Int].head() == 0)
    // agrees with the composed built-ins the binary search path uses
    val pairs = spark.range(1, 200).selectExpr("id * 2654435761 AS a", "(id + 7) * 40503 AS b")
    pairs.createOrReplaceTempView("ham_pairs")
    val viaFn = spark.sql("SELECT sum(hamming64(a, b)) FROM ham_pairs").head().getLong(0)
    val viaBuiltins = pairs.selectExpr("sum(bit_count(a ^ b))").head().getLong(0)
    assert(viaFn == viaBuiltins)
    val err = intercept[Exception](spark.sql("SELECT hamming64(1L)").collect())
    assert(err.getMessage.contains("2 argument"), err.getMessage)
  }
}
