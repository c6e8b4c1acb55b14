package graft

import org.apache.spark.sql.functions._
import graft.sources.PartitionedStore

/** Date-partitioned lake layout: static partition pruning (literal date
  * range → `PartitionFilters`, strict directory subset listed), dynamic
  * partition pruning (calendar-dim join → `dynamicpruning` subquery on the
  * fact scan), and result invariance of both queries vs the raw table.
  */
class PartitionedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rawAgg(pred: org.apache.spark.sql.Column) =
    Tables.events(spark, sfDir).withColumn("event_date", to_date($"ts"))
      .filter(pred)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum($"value".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy($"event_type")
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq

  test("prune query: literal date range reaches the scan as PartitionFilters") {
    val q = PartitionedStore.pruneQuery(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).nonEmpty,
      plan.take(2000))
    // the pruned scan must list a strict subset of the date directories
    val path = PartitionedStore.defaultPath(sfDir)
    val total = spark.read.parquet(s"$path/rows")
      .select($"event_date").distinct().count()
    val lo = spark.read.parquet(s"$path/calendar").agg(min($"event_date")).head().getDate(0)
    val scanned = spark.read.parquet(s"$path/rows")
      .filter($"event_date".between(lit(lo), date_add(lit(lo), 2)))
      .select(input_file_name()).distinct().count()
    val allFiles = spark.read.parquet(s"$path/rows")
      .select(input_file_name()).distinct().count()
    assert(total > 3, s"need >3 date partitions to demonstrate pruning, got $total")
    assert(scanned < allFiles, s"pruning read every file: $scanned/$allFiles")
  }

  test("prune query result is invariant vs the raw table") {
    val got = PartitionedStore.pruneQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
    val want = rawAgg(to_date($"ts").between(lit(lo), date_add(lit(lo), 2)))
    assert(got == want, s"layout changed the result: $got vs $want")
    assert(got.nonEmpty)
  }

  test("dpp query: fact scan carries a dynamicpruning subquery on event_date") {
    val q = PartitionedStore.dppQuery(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "expected a dynamic partition pruning filter on the fact scan:\n" + plan.take(3000))
  }

  test("dpp query result equals the raw even-day aggregate") {
    val got = PartitionedStore.dppQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = rawAgg(dayofmonth(to_date($"ts")) % 2 === 0)
    assert(got == want, s"DPP changed the result: $got vs $want")
    assert(got.nonEmpty)
  }

  test("SQL-surface prune: lake_events view plans the same PartitionFilters, result matches the DataFrame path") {
    val q = PartitionedStore.sqlPruneQuery(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).nonEmpty,
      plan.take(2000))
    val got = q.select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = PartitionedStore.pruneQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want && got.nonEmpty, s"SQL and DataFrame paths diverged: $got vs $want")
  }

  test("SQL-surface dpp: view join carries the dynamicpruning subquery, result matches") {
    val q = PartitionedStore.sqlDppQuery(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "expected DPP on the lake_events scan through the SQL views:\n" + plan.take(3000))
    val got = q.select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = PartitionedStore.dppQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("SQL-surface hidden partitioning: ts-only SQL predicate prunes via mirrored PartitionFilters, result matches") {
    val q = PartitionedStore.sqlHiddenQuery(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(plan).nonEmpty,
      "expected the rewrite to mirror the SQL ts bounds onto event_date:\n" + plan.take(2000))
    val got = q.select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = PartitionedStore.hiddenRouteQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want && got.nonEmpty, s"SQL and DataFrame hidden routes diverged: $got vs $want")
  }

  test("layout stats partition the store: row counts sum to the table") {
    val stats = PartitionedStore.layoutStats(spark, sfDir).collect()
    assert(stats.nonEmpty)
    assert(stats.map(_.getLong(2)).sum == Tables.events(spark, sfDir).count())
    assert(stats.forall(r => r.getLong(1) >= 1L &&
      r.getLong(3) == r.getLong(2) / r.getLong(1)))
  }

  test("retention drops exactly the expired partitions, idempotently") {
    val got = PartitionedStore.retentionQuery(spark, sfDir, keepDays = 7)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    // surviving directories are exactly the last 7 dates
    val root = new java.io.File(PartitionedStore.defaultPath(sfDir) + "_ret/rows")
    val dates = root.listFiles().filter(_.getName.startsWith("event_date="))
      .map(f => f.getName.stripPrefix("event_date=")).sorted
    val hi = Tables.events(spark, sfDir).agg(max(to_date($"ts"))).head().getDate(0)
    assert(dates.length <= 7)
    assert(dates.forall(d => !java.time.LocalDate.parse(d)
      .isBefore(hi.toLocalDate.minusDays(6))), s"expired partition survived: ${dates.toSeq}")
    val want = Tables.events(spark, sfDir)
      .filter(to_date($"ts") >= lit(java.sql.Date.valueOf(hi.toLocalDate.minusDays(6))))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum($"value".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy($"event_type")
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want, s"retention changed surviving rows: $got vs $want")
    val again = PartitionedStore.retentionQuery(spark, sfDir, keepDays = 7)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(again == got, "re-running retention must drop nothing new")
  }

  test("compaction: every date directory ends at one file, rows conserved, idempotent") {
    val before = Tables.events(spark, sfDir).count()
    val out = PartitionedStore.compactQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) == 1L),
      s"uncompacted partition left: ${out.filter(_.getLong(1) > 1L).mkString(",")}")
    assert(out.map(_.getLong(2)).sum == before, "compaction must conserve rows")
    val again = PartitionedStore.compactQuery(spark, sfDir).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("time travel: v1 reproduces the pre-correction result AFTER the correction landed") {
    val out = PartitionedStore.timeTravelQuery(spark, sfDir)
      .select($"version".as[Long], $"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    def rawAggWith(valueCol: org.apache.spark.sql.Column) =
      Tables.events(spark, sfDir).withColumn("v", valueCol)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          (sum($"v".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
        .orderBy($"event_type")
        .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
        .collect().toSeq
    val v1 = out.filter(_._1 == 1L).map(t => (t._2, t._3, t._4))
    assert(v1 == rawAggWith($"value"), "v1 must equal the uncorrected raw table")
    val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
    val day2 = java.sql.Date.valueOf(lo.toLocalDate.plusDays(1))
    val v2 = out.filter(_._1 == 2L).map(t => (t._2, t._3, t._4))
    assert(v2 == rawAggWith(
      when(to_date($"ts") === lit(day2), $"value" * 2).otherwise($"value")),
      "v2 must equal the corrected table")
    assert(v1 != v2, "the correction must be visible in v2 at test scale")
  }

  test("vacuum: verdicts hold, re-vacuum reclaims nothing, expired read fails, rows bit-identical") {
    val out = PartitionedStore.vacuumQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("post_equals_pre") == 1L &&
      r.getAs[Long]("expired_gone") == 1L && r.getAs[Long]("files_deleted_gt0") == 1L))
    val path = PartitionedStore.defaultPath(sfDir) + "_vac"
    // the current snapshot is BIT-identical post-vacuum (full row set, not
    // just the aggregate the verdict compared)
    val rowsAfter = PartitionedStore.readVersion(spark, path, 2)
      .select($"event_type".as[String], $"value".as[Double])
      .collect().sortBy(t => (t._1, t._2)).toSeq
    val raw = {
      val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
      val day2 = java.sql.Date.valueOf(lo.toLocalDate.plusDays(1))
      Tables.events(spark, sfDir)
        .select($"event_type".as[String],
          when(to_date($"ts") === lit(day2), $"value" * 2).otherwise($"value").as[Double])
        .collect().sortBy(t => (t._1, t._2)).toSeq
    }
    assert(rowsAfter == raw, "post-vacuum v2 rows must equal the corrected table exactly")
    // reading the expired version now FAILS — the snapshot is provably gone
    intercept[Exception](PartitionedStore.readVersion(spark, path, 1).collect())
    // idempotence: a second vacuum on the already-clean store reclaims 0
    val again = PartitionedStore.vacuum(spark, sfDir, path)
    assert(again.filesDeleted == 0L && again.bytesDeleted == 0L,
      s"re-vacuum must be a no-op, got $again")
  }

  test("vacuum refuses a store from another source generation (concurrent-rebuild guard)") {
    val tt = PartitionedStore.defaultPath(sfDir) + "_tt"
    PartitionedStore.ensureVersioned(spark, sfDir, tt)
    val p = PartitionedStore.defaultPath(sfDir) + "_vacguard"
    try {
      PartitionedStore.cloneVersioned(tt, p)
      // simulate a rebuild-in-flight: the store's fingerprint names a
      // DIFFERENT source generation than the current testdata
      new java.io.File(p).listFiles()
        .filter(_.getName.startsWith("_src_fp_"))
        .foreach(f => f.renameTo(new java.io.File(p, "_src_fp_stale")))
      val before = PartitionedStore.listParquet(p).toSet
      intercept[IllegalStateException](PartitionedStore.vacuum(spark, sfDir, p))
      assert(PartitionedStore.listParquet(p).toSet == before,
        "a refused vacuum must not have deleted anything")
      assert(new java.io.File(s"$p/_versions/v1.txt").exists(),
        "a refused vacuum must not have expired any manifest")
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(p))
  }

  test("vacuum with three versions: keepLatest=2 spares v2's files, keepLatest=1 then finishes") {
    val tt = PartitionedStore.defaultPath(sfDir) + "_tt"
    PartitionedStore.ensureVersioned(spark, sfDir, tt)
    val p = PartitionedStore.defaultPath(sfDir) + "_vac3"
    try {
      PartitionedStore.cloneVersioned(tt, p)
      // synthesize a v3: append one more correction file and a manifest
      // that keeps v2's files minus nothing plus the new file (a pure
      // append snapshot — v2 stays fully live under keepLatest=2)
      val lo = Tables.events(spark, sfDir).agg(min(to_date($"ts"))).head().getDate(0)
      val day3 = java.sql.Date.valueOf(lo.toLocalDate.plusDays(2))
      val before = PartitionedStore.listParquet(p).toSet
      Tables.events(spark, sfDir).withColumn("event_date", to_date($"ts"))
        .filter($"event_date" === lit(day3)).limit(5)
        .write.mode("append").partitionBy("event_date").parquet(s"$p/rows")
      val appended = PartitionedStore.listParquet(p).toSet -- before
      val v2Files = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$p/_versions/v2.txt")), "UTF-8")
        .split("\n").filter(_.nonEmpty).toSet
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$p/_versions/v3.txt"),
        (v2Files ++ appended).toSeq.sorted.mkString("\n").getBytes("UTF-8"))
      // keepLatest=2: v1 expires; v2 ∪ v3 files all survive (v2 ⊂ v3 here)
      val r1 = PartitionedStore.vacuum(spark, sfDir, p, keepLatest = 2)
      assert(r1.expired == Seq(1))
      assert(v2Files.forall(f => new java.io.File(f).exists()),
        "keepLatest=2 must spare every v2 file")
      assert(new java.io.File(s"$p/_versions/v2.txt").exists())
      // then keepLatest=1: v2 expires too, but v2's files are all in v3
      // (pure append), so nothing else is deleted
      val r2 = PartitionedStore.vacuum(spark, sfDir, p, keepLatest = 1)
      assert(r2.expired == Seq(2))
      assert(r2.filesDeleted == 0L,
        "v2 files are all referenced by v3 — nothing to reclaim")
      assert(PartitionedStore.readVersion(spark, p, 3).count() > 0)
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(p))
  }

  test("vacuum grace period spares young orphans, reclaims them once aged") {
    val tt = PartitionedStore.defaultPath(sfDir) + "_tt"
    PartitionedStore.ensureVersioned(spark, sfDir, tt)
    val p = PartitionedStore.defaultPath(sfDir) + "_vacgrace"
    try {
      PartitionedStore.cloneVersioned(tt, p)
      val dayDir = new java.io.File(s"$p/rows").listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("event_date="))
        .minBy(_.getName)
      val orphan = new java.io.File(dayDir, "orphan-young.parquet")
      java.nio.file.Files.write(orphan.toPath, "in-flight writer".getBytes("UTF-8"))
      // a just-written orphan survives a vacuum with a 1-hour grace —
      // but the EXPIRED version's files are exempt from grace (their
      // manifest proves no writer owns them) and still go
      val r1 = PartitionedStore.vacuum(spark, sfDir, p, orphanGraceMs = 3600 * 1000L)
      assert(orphan.exists(), "young orphan must survive the grace window")
      assert(r1.filesDeleted > 0, "expired-version files are exempt from grace")
      // aged out (grace 0): reclaimed
      PartitionedStore.vacuum(spark, sfDir, p)
      assert(!orphan.exists(), "aged orphan must be reclaimed")
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(p))
  }

  test("merge rewrites ONLY the changeset's partitions; re-apply is idempotent") {
    val first = PartitionedStore.mergeQuery(spark, sfDir).collect().toSeq
    val path = PartitionedStore.defaultPath(sfDir) + "_mg"
    val lo = spark.read.parquet(s"$path/calendar")
      .agg(min($"event_date")).head().getDate(0).toLocalDate
    val affected = Set(s"event_date=${lo.plusDays(1)}", s"event_date=${lo.plusDays(2)}")
    def fileStamps(): Map[String, Long] = {
      val rowsDir = new java.io.File(s"$path/rows")
      Option(rowsDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
        .toMap
    }
    val before = fileStamps()
    val second = PartitionedStore.mergeQuery(spark, sfDir).collect().toSeq
    val after = fileStamps()
    // idempotent: re-applying the changeset yields the same rows
    assert(second == first)
    // copy-on-write: files of untouched partitions are byte-identical
    // (same names, same mtimes); only affected dirs may change
    val untouchedBefore = before.filterNot { case (k, _) =>
      affected.exists(k.startsWith) }
    val untouchedAfter = after.filterNot { case (k, _) =>
      affected.exists(k.startsWith) }
    assert(untouchedBefore == untouchedAfter,
      s"untouched partitions changed: ${(untouchedBefore.toSet diff untouchedAfter.toSet).take(3)}")
    // and the changeset's partitions WERE rewritten on the second apply
    val touched = after.keys.filter(k => affected.exists(k.startsWith))
    assert(touched.nonEmpty)
    // the merged state differs from the pre-merge raw slice: day-2 keys
    // ≡ 0 mod 7 are gone, day-3 gained the inserted keys
    val merged = spark.read.parquet(s"$path/rows")
    val day2 = java.sql.Date.valueOf(lo.plusDays(1))
    assert(merged.filter($"event_date" === lit(day2) && $"event_id" % 7 === 0).count() == 0)
    val raw = Tables.events(spark, sfDir)
    val maxId = raw.agg(max($"event_id")).head().getLong(0)
    assert(merged.filter($"event_id" > maxId).count() ==
      raw.filter(to_date($"ts") === lit(java.sql.Date.valueOf(lo)) &&
        $"event_id" % 5 === 0).count())
  }

  test("SQL merge route: copy-on-write of only the changeset's partitions; idempotent; equals the DataFrame route") {
    val first = PartitionedStore.sqlMergeQuery(spark, sfDir).collect().toSeq
    val path = PartitionedStore.defaultPath(sfDir) + "_mgs"
    val lo = spark.read.parquet(s"$path/calendar")
      .agg(min($"event_date")).head().getDate(0).toLocalDate
    val affected = Set(s"event_date=${lo.plusDays(1)}", s"event_date=${lo.plusDays(2)}")
    def fileStamps(): Map[String, Long] = {
      val rowsDir = new java.io.File(s"$path/rows")
      Option(rowsDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified()))
        .toMap
    }
    val before = fileStamps()
    val second = PartitionedStore.sqlMergeQuery(spark, sfDir).collect().toSeq
    val after = fileStamps()
    assert(second == first, "re-applying the changeset through SQL is idempotent")
    val untouchedBefore = before.filterNot { case (k, _) => affected.exists(k.startsWith) }
    val untouchedAfter = after.filterNot { case (k, _) => affected.exists(k.startsWith) }
    assert(untouchedBefore == untouchedAfter,
      s"untouched partitions changed: ${(untouchedBefore.toSet diff untouchedAfter.toSet).take(3)}")
    assert(after.keys.exists(k => affected.exists(k.startsWith)),
      "the changeset's partitions were rewritten")
    // surface equivalence: the SQL DML route converges to the same state
    // as the DataFrame copy-on-write route (same report rows)
    val df = PartitionedStore.mergeQuery(spark, sfDir).collect().toSeq
    assert(first.map(_.toString) == df.map(_.toString),
      "SQL and DataFrame merge routes must agree")
  }

  test("merge drops an affected partition that emitted zero survivors (full-partition delete)") {
    // The general-MERGE case the built-in changeset can't reach: dynamic
    // overwrite leaves a fully-deleted partition's directory in place, so
    // the cleanup must remove exactly the affected-but-empty directories.
    val tmp = java.nio.file.Files.createTempDirectory("graft-mergedrop").toString
    try {
      val rows = s"$tmp/rows"
      Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
        .toDF("event_date", "event_id")
        .write.partitionBy("event_date").parquet(rows)
      def dirs() = new java.io.File(rows).listFiles()
        .filter(_.getName.startsWith("event_date=")).map(_.getName).toSet
      assert(dirs() == Set("event_date=2024-01-01", "event_date=2024-01-02",
        "event_date=2024-01-03"))
      // changeset touched days 1 and 2; day 1 kept rows, day 2 emptied
      PartitionedStore.dropEmptiedPartitions(rows,
        affected = Seq("2024-01-01", "2024-01-02"),
        outDates = Set("2024-01-01"))
      assert(dirs() == Set("event_date=2024-01-01", "event_date=2024-01-03"),
        "exactly the affected-but-empty directory is dropped")
      // deleted rows must NOT resurface through the reader
      val got = spark.read.parquet(rows).select($"event_id".as[Long]).collect().toSet
      assert(got == Set(1L, 3L))
      // idempotent / no-op when nothing emptied
      PartitionedStore.dropEmptiedPartitions(rows,
        Seq("2024-01-01", "2024-01-03"), Set("2024-01-01", "2024-01-03"))
      assert(dirs() == Set("event_date=2024-01-01", "event_date=2024-01-03"))
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(tmp))
  }

  test("stale source fingerprint triggers a rebuild") {
    val path = PartitionedStore.defaultPath(sfDir)
    PartitionedStore.ensure(spark, sfDir)
    val d = new java.io.File(path)
    // simulate a regenerated source: remove the stamp
    d.listFiles().filter(_.getName.startsWith("_src_fp_")).foreach(_.delete())
    val calBefore = new java.io.File(s"$path/calendar").lastModified()
    Thread.sleep(1100) // mtime granularity
    PartitionedStore.ensure(spark, sfDir)
    assert(d.listFiles().exists(_.getName.startsWith("_src_fp_")), "stamp restored")
    assert(new java.io.File(s"$path/calendar").lastModified() > calBefore,
      "missing stamp must force a rebuild")
  }
}
