package graft

import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, Relational}

/** The export-replay audits of the three approximate sketches (HLL++
  * distinct, Greenwald–Khanna percentile, Misra–Gries heavy hitters):
  * every verdict flag must be 1 — the documented error bound HOLDS on the
  * test corpus, not merely "both engines agree the bound was broken".
  * (The DuckDB oracle independently recomputes the exact sides; these
  * specs pin that the sketches themselves are within bound.)
  */
class ApproxSketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL++ distinct estimates are within the 3-sigma (15%) audit bound") {
    val rows = Relational.aggApproxDistinctAudit(spark, sfDir)
      .select($"within_3sigma").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ == 1L))
  }

  test("GK percentile values are within the epsilon-rank audit bound") {
    val rows = Relational.aggApproxPercentileAudit(spark, sfDir)
      .select($"ok_p50", $"ok_p95").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (a, b) => a == 1L && b == 1L })
  }

  test("Misra-Gries counts obey count_lb <= exact <= count_lb + n/capacity") {
    val rows = HeavyHitters.topTokensAudit(spark, sfDir)
      .select($"within_bound").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ == 1L))
  }

  test("the audits surface the sketch values themselves (usable output, not just flags)") {
    val d = Relational.aggApproxDistinctAudit(spark, sfDir)
    assert(d.columns.toSeq == Seq("l_returnflag", "approx_orders", "exact_orders", "within_3sigma"))
    val p = Relational.aggApproxPercentileAudit(spark, sfDir)
    assert(p.columns.toSeq ==
      Seq("l_returnflag", "p50_micro", "p95_micro", "n", "ok_p50", "ok_p95"))
    val h = HeavyHitters.topTokensAudit(spark, sfDir)
    assert(h.columns.toSeq == Seq("token", "count_lb", "exact_n", "within_bound"))
  }
}
