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
