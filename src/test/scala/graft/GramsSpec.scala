package graft

import org.apache.spark.sql.functions._
import graft.functions.Grams

/** Edge behavior of the shared aligned-slice k-gram builder. */
class GramsSpec extends SparkSpec {
  import spark.implicits._

  private def grams(text: String, k: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(Grams.kgrams(split($"t", " "), k).as("g"))
      .as[Seq[String]].head()

  test("k-grams slide in order with duplicates preserved") {
    assert(grams("a b a b a", 2) == Seq("a b", "b a", "a b", "b a"))
    assert(grams("w1 w2 w3 w4", 3) == Seq("w1 w2 w3", "w2 w3 w4"))
  }

  test("arrays shorter than k clamp to empty") {
    assert(grams("a b", 3) == Seq.empty)
    assert(grams("", 2) == Seq.empty) // split("") = [""] — one token, no bigram
  }

  test("exactly k tokens yield one gram") {
    assert(grams("x y z", 3) == Seq("x y z"))
  }

  test("empty split segments participate like the indexed form would") {
    // "a  b" splits to ["a", "", "b"]: the gram set must include the empty
    // middle token, matching the oracle's string_split semantics
    assert(grams("a  b", 2) == Seq("a ", " b"))
  }
}
