package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

/** Staged dedup funnel (monotone attrition, stage rules consistent with
  * the individual operators) and CUSUM changepoint (telescoping-sum
  * invariant, peak flagging).
  */
class FunnelChangepointSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: stages attrit monotonically and match their operators' counts") {
    val out = Dedup.dedupFunnel(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val ns = out.map(_.getLong(2))
    assert(ns.sliding(2).forall(p => p(1) <= p(0)), s"funnel must not grow: ${ns.toSeq}")
    assert(ns(0) == Tables.documents(spark, sfDir).count())
    val distinctTexts = Tables.documents(spark, sfDir)
      .select(md5($"text")).distinct().count()
    assert(ns(1) == distinctTexts, "exact stage must equal distinct-text count")
  }

  test("pareto: milestones are monotone and the 50% milestone is a strict minority") {
    val out = Relational.revenueConcentration(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(500L, 800L, 900L))
    val ns = out.map(_.getLong(1))
    assert(ns.sliding(2).forall(p => p(0) <= p(1)), s"more revenue needs more customers: ${ns.toSeq}")
    assert(out.head.getLong(2) < 500L,
      s"revenue should concentrate: 50% of revenue needs ${out.head.getLong(2)}‰ of customers")
    // independent replay of the 50% milestone
    val perCust = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .withColumn("rev_c", (($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1) - $"l_discount".cast("decimal(18,2)"))).cast("decimal(18,4)") * 10000).cast("long"))
      .groupBy($"o_custkey").agg(sum($"rev_c").as("r"))
      .select($"r".as[Long]).collect().sorted(Ordering[Long].reverse)
    val total = perCust.sum
    var cum = 0L; var k = 0
    while (cum * 1000 < total * 500) { cum += perCust(k); k += 1 }
    assert(out.head.getLong(1) == k.toLong, s"50% milestone: got ${out.head.getLong(1)}, want $k")
  }

  test("wau: trailing window dominates dau, day-1 wau equals dau, ratio consistent") {
    val out = Relational.wauReport(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)),
      "a 7-day window can never contain fewer users than its last day")
    assert(out.head.getLong(1) == out.head.getLong(2),
      "the first day's trailing window is just that day")
    assert(out.forall(r => r.getLong(3) == r.getLong(1) * 1000000L / r.getLong(2)))
  }

  test("quality curve: monotone non-increasing in tau, endpoints sane") {
    val out = graft.operators.TextAnalysis.qualityBudgetCurve(spark, sfDir).collect()
    assert(out.length == 5)
    val docs = out.map(_.getLong(1))
    val toks = out.map(_.getLong(2))
    assert(docs.sliding(2).forall(p => p(1) <= p(0)), s"docs not monotone: ${docs.toSeq}")
    assert(toks.sliding(2).forall(p => p(1) <= p(0)), s"tokens not monotone: ${toks.toSeq}")
    assert(docs.head <= Tables.documents(spark, sfDir).count())
  }

  test("gini: bounds honored, single-type day reads zero, uniform types read (k-1)/k") {
    val out = Relational.typeGini(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val (k, g) = (r.getLong(2), r.getLong(3))
      g >= 0L && g <= 1000000L - 1000000L / k
    }, "gini must sit in [0, 1 - 1/k]")
    // closed-form check on a uniform toy distribution
    val toy = Seq.tabulate(40)(i => (java.sql.Date.valueOf("2024-01-01"), s"t${i % 4}"))
      .toDF("event_date", "event_type")
    val g = toy.groupBy($"event_date", $"event_type").agg(count(lit(1)).as("n_t"))
      .groupBy($"event_date")
      .agg(expr("1000000 - (sum(n_t * n_t) * 1000000) DIV (sum(n_t) * sum(n_t))").as("g"))
      .select($"g".as[Long]).head()
    assert(g == 750000L, s"uniform 4-type gini must be 750000, got $g")
  }

  test("transitions: counts partition the pair stream, probabilities sum to ~1000 per row") {
    val out = Relational.transitionMatrix(spark, sfDir).collect()
    assert(out.nonEmpty)
    val nPairs = out.map(_.getLong(2)).sum
    val nEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir).select($"user_id").distinct().count()
    assert(nPairs == nEvents - nUsers,
      s"each user contributes |events|-1 transitions: $nPairs vs ${nEvents - nUsers}")
    out.groupBy(_.getString(0)).foreach { case (ft, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000L && s >= 1000L - rows.length,
        s"floor-division permilles for $ft must sum to (1000 - ties]: $s")
    }
  }

  test("changepoint: cusum telescopes to zero on the last day, exactly one peak value") {
    val out = Relational.changepoint(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.last.getLong(2) == 0L,
      s"sum of scaled deviations over all days must telescope to 0, got ${out.last.getLong(2)}")
    val mx = out.map(r => math.abs(r.getLong(2))).max
    assert(out.forall(r => r.getBoolean(3) == (math.abs(r.getLong(2)) == mx)))
    assert(out.exists(_.getBoolean(3)))
  }
}
