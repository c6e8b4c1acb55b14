package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedStore
import graft.plans.HiddenPartitionRewrite

/** Hidden partitioning: a data-column date filter (`to_date(ts)`) over
  * the partitioned store acquires mirrored `event_date` PartitionFilters
  * at optimization time; pruning is real (strict file subset), exact
  * (same rows with the rule off), memoized (no filesystem IO after the
  * first matching plan), and inert on non-store layouts.
  */
class HiddenPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("date filter on ts acquires event_date PartitionFilters") {
    val q = PartitionedStore.hiddenRouteQuery(spark, sfDir)
    val plan = planOf(q)
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).nonEmpty,
      plan.take(3000))
  }

  test("rewrite is exact: rows identical with the rule disabled, and pruning is real") {
    val path = PartitionedStore.ensure(spark, sfDir)
    val rows = spark.read.parquet(s"$path/rows")
    val lo = spark.read.parquet(s"$path/calendar").agg(min($"event_date")).head().getDate(0)
    def q() = rows.filter(to_date($"ts")
        .between(lit(java.sql.Date.valueOf(lo.toLocalDate.plusDays(3))),
          lit(java.sql.Date.valueOf(lo.toLocalDate.plusDays(5)))))
      .select($"event_id")
    // files the SCAN actually lists (post-partition-pruning), not files
    // that happened to produce matching rows
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.getOrElse(fail("no file scan in plan"))
    }
    val onDf = q()
    val on = onDf.as[Long].collect().sorted.toSeq
    val filesOn = scannedFiles(q())
    spark.conf.set("spark.graft.layout.rewrite.enabled", "false")
    val (off, filesOff) =
      try (q().as[Long].collect().sorted.toSeq, scannedFiles(q()))
      finally spark.conf.set("spark.graft.layout.rewrite.enabled", "true")
    assert(on == off, "hidden-partition routing changed the result")
    assert(on.nonEmpty)
    assert(filesOn < filesOff,
      s"rewrite must scan a strict file subset: $filesOn vs $filesOff")
  }

  test("detection is memoized: zero filesystem calls on the second plan") {
    HiddenPartitionRewrite.invalidateAll()
    val before = HiddenPartitionRewrite.fsDetectCalls.get()
    PartitionedStore.hiddenRouteQuery(spark, sfDir).queryExecution.executedPlan
    val afterFirst = HiddenPartitionRewrite.fsDetectCalls.get()
    assert(afterFirst > before, "first plan must detect the store")
    PartitionedStore.hiddenRouteQuery(spark, sfDir).queryExecution.executedPlan
    assert(HiddenPartitionRewrite.fsDetectCalls.get() == afterFirst,
      "second plan over the same path must do no filesystem IO")
  }

  test("rule is inert on a shape-coincident foreign store (rows + calendar, no _src_fp stamp)") {
    val root = s"/tmp/graft_hidden_foreign_${System.nanoTime()}"
    try {
      Tables.events(spark, sfDir).withColumn("event_date", to_date($"ts"))
        .write.partitionBy("event_date").parquet(s"$root/rows")
      Tables.events(spark, sfDir).select(to_date($"ts").as("event_date")).distinct()
        .write.parquet(s"$root/calendar") // shape matches; generation stamp absent
      HiddenPartitionRewrite.invalidateAll()
      val d = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
      val plan = planOf(spark.read.parquet(s"$root/rows")
        .filter(to_date($"ts") === lit(d)).select($"event_id"))
      assert("PartitionFilters: \\[[^\\]]*event_date[^\\]]*=".r.findFirstIn(plan).isEmpty,
        "rule must not fire without the _src_fp_ writer stamp:\n" + plan.take(2000))
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(root))
  }

  test("rule is inert under a non-UTC session timezone") {
    val path = PartitionedStore.ensure(spark, sfDir)
    val d = spark.read.parquet(s"$path/calendar").agg(min($"event_date")).head().getDate(0)
    def plan() = planOf(spark.read.parquet(s"$path/rows")
      .filter(to_date($"ts") === lit(d)).select($"event_id"))
    assert("PartitionFilters: \\[[^\\]]*event_date[^\\]]*=".r.findFirstIn(plan()).nonEmpty,
      "precondition: rule fires under UTC")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try
      assert("PartitionFilters: \\[[^\\]]*event_date[^\\]]*=".r.findFirstIn(plan()).isEmpty,
        "a non-UTC reader's day floor names a different partition day — rule must stay inert")
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("store rebuild invalidates the cached detection verdict for its rows root") {
    PartitionedStore.ensure(spark, sfDir)
    // prime the cache with a positive verdict
    PartitionedStore.hiddenRouteQuery(spark, sfDir).queryExecution.executedPlan
    val primed = HiddenPartitionRewrite.fsDetectCalls.get()
    PartitionedStore.hiddenRouteQuery(spark, sfDir).queryExecution.executedPlan
    assert(HiddenPartitionRewrite.fsDetectCalls.get() == primed, "verdict memoized")
    // a rebuild through the writer must drop exactly this path's entry:
    // the next plan re-detects (one new FS probe) instead of reusing it
    PartitionedStore.write(spark, sfDir, PartitionedStore.defaultPath(sfDir))
    PartitionedStore.hiddenRouteQuery(spark, sfDir).queryExecution.executedPlan
    assert(HiddenPartitionRewrite.fsDetectCalls.get() == primed + 1,
      "write() must invalidate the memoized verdict so the new layout re-detects")
  }

  test("rule is inert on a date-partitioned layout that is not a store") {
    val out = s"/tmp/graft_hidden_plain_${System.nanoTime()}"
    try {
      Tables.events(spark, sfDir).withColumn("event_date", to_date($"ts"))
        .write.partitionBy("event_date").parquet(out) // no calendar sibling
      val d = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
      val plan = planOf(spark.read.parquet(out)
        .filter(to_date($"ts") === lit(d)).select($"event_id"))
      assert("PartitionFilters: \\[[^\\]]*event_date[^\\]]*=".r.findFirstIn(plan).isEmpty,
        "rule must not fire without the store marker:\n" + plan.take(2000))
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(out))
  }
}
