package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Deterministic synchronous label propagation: density-aware splitting
  * (two cliques joined by one bridge stay separate — the behavior that
  * distinguishes LPA from connected components), determinism, and the
  * named query's structural invariants.
  */
class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  /** Run the same fixed-round LPA as dupLabelProp over an explicit edge list. */
  private def lpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val p = pairs.toDF("id_a", "id_b")
    val edges = p.unionAll(p.select($"id_b".as("id_a"), $"id_a".as("id_b")))
      .toDF("src", "dst")
    var lab = edges.select($"src".as("node")).distinct()
      .select($"node", $"node".as("label"))
    for (_ <- 1 to rounds) {
      val votes = edges.join(lab, edges("src") === lab("node"))
        .select($"dst".as("node"), $"label")
        .unionAll(lab.select($"node", $"label"))
        .groupBy($"node", $"label").agg(count(lit(1)).as("c"))
      lab = votes.groupBy($"node")
        .agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
        .select($"node", (-$"m.nl").as("label"))
    }
    lab.select($"node".as[Long], $"label".as[Long]).collect().toMap
  }

  test("two triangles joined by a bridge form two communities (CC would give one)") {
    val tri2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val labels = lpa(tri2, 3)
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L), s"left clique split: $labels")
    assert(labels(4L) == labels(5L) && labels(5L) == labels(6L), s"right clique split: $labels")
    assert(labels(1L) != labels(4L), s"bridge merged the cliques: $labels")
  }

  test("a clique collapses to its smallest member's label") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val labels = lpa(k4, 3)
    assert(labels.values.toSet == Set(1L), s"clique must converge to min label: $labels")
  }

  test("named query: deterministic, labels are members, sizes consistent") {
    val a = Dedup.dupLabelProp(spark, sfDir).collect().toSeq
    val b = Dedup.dupLabelProp(spark, sfDir).collect().toSeq
    assert(a == b, "label propagation must be deterministic")
    val nodes = a.map(_.getLong(0)).toSet
    assert(a.forall(r => nodes.contains(r.getLong(1))), "every label is some node's id")
    val byLabel = a.groupBy(_.getLong(1))
    assert(a.forall(r => r.getLong(2) == byLabel(r.getLong(1)).size.toLong),
      "community_size must equal the actual member count")
  }
}
