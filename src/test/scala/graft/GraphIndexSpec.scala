package graft

import org.apache.spark.sql.functions._
import graft.sources.GraphIndex
import graft.operators.VectorSearch

/** The HNSW-twin kNN-graph index (`Milvus/stream1.py:117`): NN-Descent
  * build quality, degree/determinism invariants, beam-search recall, and
  * the probe-side scan pruning that makes hops cheap on the sorted layout.
  */
class GraphIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val path = {
    val p = GraphIndex.defaultPath(sfDir)
    GraphIndex.ensure(spark, sfDir, p)
    p
  }

  private lazy val edges = spark.read.parquet(s"$path/edges")

  test("persisted graph: every node present, out-degree bounded by M") {
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
    val n = Tables.embeddings(spark, sfDir).count()
    assert(deg.count() == n, "every corpus node keeps a neighbor list")
    assert(deg.agg(max($"d")).as[Long].head() <= GraphIndex.M.toLong)
    assert(edges.filter($"src" === $"dst").isEmpty, "no self-loops")
  }

  test("build is deterministic: two independent builds produce the same edge set") {
    val a = GraphIndex.build(spark, sfDir).select($"src", $"dst")
      .as[(Long, Long)].collect().toSet
    val b = GraphIndex.build(spark, sfDir).select($"src", $"dst")
      .as[(Long, Long)].collect().toSet
    assert(a == b)
  }

  test("NN-Descent converges: persisted edges capture the true top-M neighborhood") {
    // Brute-force top-M per node (the small-SF oracle for build quality).
    val base = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val exact = VectorSearch.knnDeclarative(
      base.select($"vec_id".as("qid"), $"embedding".as("qvec")), base, GraphIndex.M)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val got = edges.select($"src", $"dst").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.95, f"edge recall@${GraphIndex.M} = $recall%.3f")
  }

  test("beam search finds the exact top-5 (recall >= 0.9 on the bench corpus)") {
    val exact = VectorSearch.knnExact(spark, sfDir)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val got = GraphIndex.searchQuery(spark, sfDir)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    assert(got.size == exact.size, "full top-k per query")
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, f"search recall@5 = $recall%.3f")
  }

  test("wider beam never loses recall (the ef dial, monotone by construction)") {
    val q = VectorSearch.querySet(spark, sfDir, 5)
    val exact = VectorSearch.knnExact(spark, sfDir)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    def recallAt(beam: Int): Double = {
      val got = GraphIndex.search(spark, sfDir, path, q, beam = beam)
        .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    // visited(beam=4) ⊆ visited(beam=32) hop by hop is not guaranteed in
    // general beam search, but recall must not degrade on this corpus —
    // the dial the reference exposes as ef (`stream1.py:161-162`).
    assert(recallAt(32) >= recallAt(4))
  }

  test("past the inline-id bound the frontier broadcast-joins — rows identical") {
    // maxInlineIds = 0 forces the large-nq path on every hop: the frontier
    // never collects to the driver and the hop joins the edges instead of
    // inlining an IN-list. Results must be row-for-row the inline path's.
    val q = VectorSearch.querySet(spark, sfDir, 5)
    val inline = GraphIndex.search(spark, sfDir, path, q).collect()
    val joined = GraphIndex.search(spark, sfDir, path, q, maxInlineIds = 0).collect()
    assert(inline.toSeq == joined.toSeq)
  }

  test("hop probes prune the sorted edge scan via a pushed IN-filter") {
    val probe = edges.filter($"src".isin(0L, 97L, 194L))
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [In(src"),
      s"probe scan must push the frontier IN-list:\n$scan")
  }

  test("degree stats query matches a recount of the persisted edges") {
    val out = GraphIndex.degreeStats(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val expect = edges.groupBy($"src").agg(count(lit(1)).as("d"))
      .groupBy($"d").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == expect)
    assert(out.values.sum == Tables.embeddings(spark, sfDir).count())
  }
}
