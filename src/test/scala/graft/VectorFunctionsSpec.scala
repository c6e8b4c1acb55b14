package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** V1–V3 kernels: algebraic identities checked through the Catalyst
  * expressions themselves (not a Scala reimplementation). Property-style:
  * seeded random vectors, many trials, exact identities.
  */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randVec(n: Int = 8): List[Float] =
    List.fill(n)(rnd.nextFloat() * 20f - 10f)

  test("dot/norm/l2 identities on generated vectors") {
    val pairs = Seq.fill(20)((randVec(), randVec()))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      dot($"a", $"b").as("ab"),
      dot($"b", $"a").as("ba"),
      norm2($"a").as("na"),
      norm2($"b").as("nb"),
      l2Distance($"a", $"b").as("d"),
      l2DistanceSq($"a", $"b").as("d2")).collect()
    rows.foreach { row =>
      val (ab, ba, na, nb, d, d2) = (row.getDouble(0), row.getDouble(1),
        row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
      assert(math.abs(ab - ba) < 1e-9, "dot symmetric")
      assert(math.abs(d * d - d2) < 1e-6, "l2^2 == l2sq")
      // polarization: |a-b|^2 = |a|^2 + |b|^2 - 2<a,b>
      assert(math.abs(d2 - (na * na + nb * nb - 2 * ab)) < 1e-6)
    }
  }

  test("cosine is 1 on self and bounded on random pairs") {
    val pairs = Seq.fill(20)((randVec(), randVec()))
    val selfs = pairs.map(p => (p._1, p._1)).toDF("a", "b")
      .select(cosine($"a", $"b")).as[Double].collect()
    selfs.foreach(c => assert(c > 0.999999 && c < 1.000001))
    val cross = pairs.toDF("a", "b")
      .select(cosine($"a", $"b")).as[Double].collect()
    cross.foreach(c => assert(c >= -1.000001 && c <= 1.000001))
  }

  test("signLshBucket is deterministic and within [0, 2^bits)") {
    val e = Tables.embeddings(spark, sfDir)
    val buckets = e.select(signLshBucket($"embedding", 8).as("b"))
      .agg(min($"b"), max($"b")).head()
    assert(buckets.getLong(0) >= 0L)
    assert(buckets.getLong(1) < 256L)
  }

  test("micro is floor(1e6 x)") {
    val df = Seq(0.1234567, -0.1234567).toDF("x")
    val got = df.select(micro($"x")).as[Long].collect().toSeq
    assert(got == Seq(123456L, -123457L))
  }
}
