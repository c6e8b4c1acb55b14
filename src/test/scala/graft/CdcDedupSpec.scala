package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Content-defined chunking: boundary re-synchronization after an edit
  * (the property fixed-size chunking lacks), determinism, coverage
  * (chunks partition the token stream), and the dup-share report.
  */
class CdcDedupSpec extends SparkSpec {
  import spark.implicits._

  private val text =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi " +
      "omicron pi rho sigma tau upsilon phi chi psi omega one two three four five six"

  test("chunks partition the token stream: word counts sum to doc length") {
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val n = Dedup.cdcChunks(docs, 8).agg(sum($"n_words")).head().getLong(0)
    assert(n == text.split(" ").length.toLong)
  }

  test("edit at the front: chunk hashes re-synchronize after the first boundary") {
    val docs = Seq((1L, text), (2L, "inserted preamble words " + text))
      .toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, 8)
      .select($"doc_id", $"chunk_hash").collect()
    val h1 = ch.filter(_.getLong(0) == 1L).map(_.getString(1)).toSet
    val h2 = ch.filter(_.getLong(0) == 2L).map(_.getString(1)).toSet
    val shared = h1.intersect(h2)
    // fixed-size blocks would shift everywhere; content-defined boundaries
    // must preserve at least one suffix chunk across the prefix edit
    assert(shared.nonEmpty,
      s"no chunk survived a prefix edit — boundaries are not content-defined: $h1 vs $h2")
  }

  test("identical docs share every chunk; the report flags them at 1000 permille") {
    val docs = Seq((1L, text), (2L, text), (3L, "totally different unrelated words here"))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(docs, 8)
    val occ = chunks.groupBy($"chunk_hash").agg(countDistinct($"doc_id").as("n_docs"))
    val rep = chunks.join(occ, Seq("chunk_hash"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"n_docs" >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("permille", expr("n_dup * 1000 DIV n_chunks"))
      .select($"doc_id".as[Long], $"permille".as[Long]).collect().toMap
    assert(rep(1L) == 1000L && rep(2L) == 1000L, s"exact copies must be fully duplicated: $rep")
    assert(rep(3L) == 0L, s"unique doc must have zero dup share: $rep")
  }

  test("incremental containment: batch docs copied from the corpus read 1000 permille") {
    val out = Dedup.cdcIncremental(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val (n, k, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
      n > 0 && k >= 0 && k <= n && p == k * 1000 / n
    })
    // a batch doc whose text verbatim-equals a corpus doc must be fully known
    val docs = Tables.documents(spark, sfDir)
    val copies = docs.filter($"doc_id" % 10 === 0).as("b")
      .join(docs.filter($"doc_id" % 10 =!= 0).as("c"), $"b.text" === $"c.text")
      .select($"b.doc_id").as[Long].collect().toSet
    if (copies.nonEmpty)
      assert(out.filter(r => copies(r.getLong(0))).forall(_.getLong(3) == 1000L),
        "verbatim corpus copies must be 100% known")
  }

  test("novelty decay: first decile is fully novel, totals cover all gram occurrences") {
    val out = graft.operators.TextAnalysis.noveltyDecay(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(out.head.getLong(0) == 0L)
    // every gram in doc 0's decile-0... the FIRST doc's grams are all novel,
    // and decile 0 contains the corpus's first docs — novelty there must
    // strictly exceed the last decile's on a phrase-reusing corpus
    assert(out.head.getLong(3) >= out.last.getLong(3),
      s"novelty should not grow with corpus position: ${out.map(_.getLong(3)).toSeq}")
    val totalGrams = graft.operators.Dedup.shingles(Tables.documents(spark, sfDir))
      .select(explode($"sh")).count()
    assert(out.map(_.getLong(1)).sum == totalGrams, "deciles must partition gram occurrences")
  }

  test("named query is deterministic and doc-complete at test scale") {
    val a = Dedup.cdcDedup(spark, sfDir).collect().toSeq
    val b = Dedup.cdcDedup(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.length == Tables.documents(spark, sfDir).count())
    assert(a.forall { r =>
      val (n, d, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
      n > 0 && d >= 0 && d <= n && p == d * 1000 / n
    })
  }
}
