package graft

import graft.operators.TextAnalysis

/** Unigram-LM tokenizer trainer: the integer Viterbi objective's laws
  * (segmentation validity, fewest-pieces dominance, longest-piece
  * tie-break), the EM conservation law (every character of every train
  * type is covered exactly once per round, so weighted character mass is
  * invariant), and trainer determinism.
  */
class UnigramLmSpec extends SparkSpec {

  private val Big = 1000000000000L

  test("viterbi: pieces concatenate back to the word, always") {
    val cnt = Map("a" -> 3L, "b" -> 1L, "c" -> 7L, "ab" -> 5L, "bca" -> 2L)
    for (w <- Seq("a", "ab", "abc", "abcabc", "cab", "bbbb", "abcba")) {
      val ps = TextAnalysis.viterbiPieces(w, cnt, 4, Big)
      assert(ps.mkString == w, s"$w -> $ps")
    }
  }

  test("viterbi: fewest pieces dominate any frequency sum (the BIG law)") {
    // 'a' and 'b' are enormously frequent, 'ab' is rare — one piece wins
    val cnt = Map("a" -> 999999999L, "b" -> 999999999L, "ab" -> 1L)
    assert(TextAnalysis.viterbiPieces("ab", cnt, 4, Big) == List("ab"))
  }

  test("viterbi: among equal-length segmentations, higher total frequency wins") {
    // "abc" as ab+c (5+1=6) vs a+bc (2+9=11): both 2 pieces, a+bc wins
    val cnt = Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "ab" -> 5L, "bc" -> 9L)
    assert(TextAnalysis.viterbiPieces("abc", cnt, 4, Big) == List("a", "bc"))
  }

  test("viterbi: ties resolve to the longest final piece (deterministic walk)") {
    // "aaa" = aa+a or a+aa — equal value; the walk prefers the longer
    // piece at the end, so the LAST piece is 'a' only after 'aa' is taken
    val cnt = Map("a" -> 5L, "aa" -> 10L)
    assert(TextAnalysis.viterbiPieces("aaa", cnt, 4, Big) == List("a", "aa"))
    // check: walking backward from j=3, l=2 ('aa') is tried first and
    // achieves the optimum, leaving 'a' for the front
  }

  test("EM conservation: weighted character mass of usage equals the train mass") {
    val (types, usage) = TextAnalysis.unigramLmFit(spark, sfDir,
      rounds = 3, topWords = 300, maxPieceLen = 4)
    val trainMass = types.map { case (w, n) => n * w.length }.sum
    val usageMass = usage.map { case (p, u) => u * p.length }.sum
    assert(usageMass == trainMass,
      s"every char of every type must be covered exactly once: $usageMass vs $trainMass")
    assert(usage.forall(_._2 > 0))
  }

  test("trainer is deterministic and prunes: final pieces are seed substrings") {
    val (types, usage1) = TextAnalysis.unigramLmFit(spark, sfDir, 3, 300, 4)
    val (_, usage2) = TextAnalysis.unigramLmFit(spark, sfDir, 3, 300, 4)
    assert(usage1.sortBy(_._1).toSeq == usage2.sortBy(_._1).toSeq)
    val seedPieces = types.flatMap { case (w, _) =>
      for {
        s <- 0 until w.length
        l <- 1 to math.min(4, w.length - s)
      } yield w.substring(s, s + l)
    }.toSet
    assert(usage1.forall { case (p, _) => seedPieces.contains(p) })
  }

  test("named query: ranked census matches the fit, bounded by topK") {
    val out = TextAnalysis.unigramLm(spark, sfDir).collect()
    val (_, usage) = TextAnalysis.unigramLmFit(spark, sfDir, 3, 300, 4)
    val expect = usage.sortBy { case (p, u) => (-u, p) }.take(50)
      .zipWithIndex.map { case ((p, u), i) => (i + 1L, p, p.length.toLong, u) }
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      == expect.toSeq)
    assert(out.length <= 50)
  }
}
