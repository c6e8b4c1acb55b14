package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Word k-gram construction shared by the sketch/dedup/curation operators:
  * "w1 w2 … wk" strings built as a left fold of zip_with over k aligned
  * slice()s — two linear passes per level, no per-element index lookups.
  * (The indexed-transform form — `transform(ws, (_, i) => when(i < n−k+1,
  * concat_ws of k element_at))` + null filter — produces the same strings
  * ~6× slower: the conditional + repeated element_at path stays interpreted
  * per element. For arrays shorter than k the slice length clamps to 0 →
  * empty result.)
  */
object Grams {
  /** k-grams of the string-array column `ws`, in order, with duplicates. */
  def kgrams(ws: Column, k: Int): Column = {
    val n = greatest(size(ws) - (k - 1), lit(0))
    (2 to k).foldLeft(slice(ws, lit(1), n)) { (acc, i) =>
      zip_with(acc, slice(ws, lit(i), n), (a, b) => concat(a, lit(" "), b))
    }
  }
}
