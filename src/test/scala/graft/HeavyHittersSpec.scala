package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Misra–Gries guarantees, asserted against exact counts at test scale:
  * every item above the n/capacity frequency threshold is present, and
  * every reported count is a lower bound that undercounts by at most
  * n/capacity. The summary itself is order-dependent (why the named query
  * has no oracle); the GUARANTEES are not.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("misra-gries: heavy items present, counts are bounded undercounts") {
    val capacity = 20
    val exact = Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .select($"w".as[String], $"c".as[Long]).collect().toMap
    val n = exact.values.sum
    val err = n / capacity
    val sketch = HeavyHitters.topTokens(spark, sfDir, capacity)
      .select($"token".as[String], $"count_lb".as[Long]).collect().toMap
    assert(sketch.size <= capacity, "summary exceeds its capacity")
    // guarantee 1: anything with true frequency > n/capacity survives
    val mustHave = exact.filter(_._2 > err).keySet
    assert(mustHave.subsetOf(sketch.keySet),
      s"missing heavy items: ${(mustHave -- sketch.keySet).take(5)}")
    // guarantee 2: reported counts are lower bounds within n/capacity
    sketch.foreach { case (w, lb) =>
      val t = exact.getOrElse(w, 0L)
      assert(lb <= t, s"$w over-counted: $lb > $t")
      assert(t - lb <= err, s"$w undercounts past the bound: $t - $lb > $err")
    }
  }

  test("misra-gries merge is the mergeable-summaries reduction (capacity respected across partitions)") {
    // force many partitions so merge() actually runs, then re-check size
    val sketch = HeavyHitters.topTokens(spark, sfDir, 5)
    assert(sketch.count() <= 5)
  }
}
