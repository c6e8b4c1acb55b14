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

  test("count-min: sketch is depth×width bounded, estimates never undercount, bound verdict all-green") {
    import spark.implicits._
    val width = 4096; val depth = 4
    val ev = Tables.events(spark, sfDir).select(col("user_id"))
    val sketch = HeavyHitters.countMinSketch(ev, col("user_id"), width, depth)
    assert(sketch.count() <= depth.toLong * width, "sketch exceeds its counter budget")
    // per depth row the counters partition the stream: Σ cnt = n exactly
    val perRow = sketch.groupBy(col("d")).agg(sum(col("cnt")).as("s")).collect()
    val n = ev.count()
    perRow.foreach { r =>
      assert(r.getAs[Long]("s") == n,
        s"row ${r.get(0)} sums to ${r.getAs[Long]("s")}, stream length is $n") }
    val audit = HeavyHitters.countMinAudit(spark, sfDir, width, depth).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CM undercounted ${r.getAs[Long]("user_id")}")
      assert(r.getAs[Long]("within_bound") == 1L,
        s"user ${r.getAs[Long]("user_id")}: est ${r.getAs[Long]("est_cnt")} vs exact ${r.getAs[Long]("exact_cnt")} exceeds 8n/w")
    }
  }
}
