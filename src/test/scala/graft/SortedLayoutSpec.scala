package graft

import org.apache.spark.sql.functions._
import graft.sources.SortedLayout

/** Range-clustered parquet layout: disjoint per-file key ranges (the
  * precondition for min/max pruning), bounded file sizes, and a range
  * predicate that reaches the scan as a pushed filter.
  */
class SortedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val out = s"/tmp/graft_sorted_layout_${System.nanoTime()}"

  test("file key ranges are pairwise disjoint and files are size-bounded") {
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    SortedLayout.write(docs, out, "doc_id", numFiles = 4, maxRecordsPerFile = 100L)
    val ranges = SortedLayout.fileRanges(spark, out, "doc_id")
      .select($"lo".as[Long], $"hi".as[Long], $"rows".as[Long]).collect()
    assert(ranges.length >= 4, s"expected >=4 files, got ${ranges.length}")
    assert(ranges.forall(_._3 <= 100L), "maxRecordsPerFile bound violated")
    // sorted by lo; every file's range must end before the next begins —
    // exactly the property parquet min/max stats need to prune a range scan
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a._2 < b._1, s"overlap: $a vs $b")
      case _           =>
    }
    // nothing lost in the layout shuffle
    assert(SortedLayout.read(spark, out).count() == docs.count())
  }

  test("a range predicate over the sorted layout is pushed to the scan") {
    val p = SortedLayout.read(spark, out)
      .filter($"doc_id" >= 100 && $"doc_id" < 200)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(doc_id,100)"),
      p.take(2000))
  }

  test("zone-map manifest prunes files; pruned scan equals the full-table filter") {
    val path = SortedLayout.ensureDocStore(spark, sfDir)
    val (kept, total) = SortedLayout.overlappingFiles(spark, path, 100L, 299L)
    assert(total >= 4, s"store should have several files, got $total")
    assert(kept.nonEmpty && kept.length < total,
      s"manifest should skip files: kept ${kept.length} of $total")
    val pruned = SortedLayout.rangeQuery(spark, sfDir).collect().toSeq
    val full = Tables.documents(spark, sfDir)
      .filter($"doc_id".between(100, 299))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"lang").collect().toSeq
    assert(pruned == full, "conservative pruning must not change the result")
    // a range beyond every zone prunes everything
    val (none, _) = SortedLayout.overlappingFiles(spark, path, Long.MaxValue - 1, Long.MaxValue)
    assert(none.isEmpty)
  }

  test("absorb: day-2 delta lands in its own files, manifest commits, pruned scans see it") {
    val path = SortedLayout.ensureAbsorbStore(spark, sfDir)
    val got = SortedLayout.absorbQuery(spark, sfDir).collect().toSeq
    val want = Tables.documents(spark, sfDir).filter($"doc_id".between(300, 599))
      .groupBy($"lang").agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("chars"),
        min($"doc_id").as("min_id"), max($"doc_id").as("max_id"))
      .orderBy($"lang").collect().toSeq
    assert(got == want, "absorbed rows must be visible through the pruned path")
    // both halves present: nothing lost in the staged move
    assert(spark.read.parquet(s"$path/data").count() ==
      Tables.documents(spark, sfDir).count())
    // the manifest covers exactly the data files — no orphan, no missing
    val files = new java.io.File(s"$path/data").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val manifest = spark.read.parquet(s"$path/zonemap")
      .select($"file".as[String]).collect()
      .map(f => new java.io.File(new java.net.URI(f)).getName).toSet
    assert(manifest == files,
      s"manifest drift: ${(files -- manifest) ++ (manifest -- files)}")
    // base files + delta files, never a merge-rewrite
    assert(files.size >= 6, s"expected base+delta file sets, got ${files.size}")
  }

  override def afterAll(): Unit = {
    graft.streaming.StreamOps.rmTree(new java.io.File(out))
    super.afterAll()
  }
}
