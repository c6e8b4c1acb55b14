package graft

import org.apache.spark.sql.functions._
import graft.embed.Featurizer
import graft.functions.VectorFunctions._

/** F1 featurizer: the deterministic stand-in for the reference's
  * sentence-transformer encode (`FAISS/PlainDemo/pipeline.py:62,313`) —
  * fixed dim, unit norm, deterministic, similar strings ⇒ similar vectors.
  */
class FeaturizerSpec extends SparkSpec {
  import spark.implicits._

  test("embeddings are unit-norm, fixed-dim, deterministic") {
    val v1 = Featurizer.embed("hello world this is a packet")
    val v2 = Featurizer.embed("hello world this is a packet")
    assert(v1.length == Featurizer.DefaultDim)
    assert(v1.toSeq == v2.toSeq, "deterministic")
    val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("similar strings are closer than dissimilar ones") {
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val base = Featurizer.embed("192.168.1.5 10.0.0.7 TCP 443 1500")
    val near = Featurizer.embed("192.168.1.6 10.0.0.7 TCP 443 1500")
    val far = Featurizer.embed("completely unrelated text about cats")
    assert(cos(base, near) > cos(base, far))
  }

  test("embedBatched matches the per-row UDF and preserves row count") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text").limit(50)
    val batched = Featurizer.embedBatched(docs, "text", "emb")
    val viaUdf = docs.withColumn("emb", Featurizer.embedUdf()($"text"))
    val joined = batched.as("a").join(viaUdf.as("b"), "doc_id")
      .select(dot($"a.emb", $"b.emb").as("sim"))
    val sims = joined.as[Double].collect()
    assert(sims.length == 50)
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-5), "same vector both paths")
  }

  test("embedded docs are unit-norm through the Catalyst norm") {
    val out = operators.EmbedQueries.embedDocs(spark, sfDir)
    val norms = out.select($"norm_micro").as[Long].collect()
    assert(norms.forall(n => n >= 999990L && n <= 1000000L))
  }
}
