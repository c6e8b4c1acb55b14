package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.IndexStore
import graft.streaming.StreamOps

/** Market-basket brand lift, split-half centroid drift, and the streaming
  * partitioned-ingest twin.
  */
class BasketDriftSpec extends SparkSpec {
  import spark.implicits._

  test("basket pairs: symmetric-count consistency and independent pair replay") {
    val out = Relational.basketPairs(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    // independent replay of one pair's count
    val ob = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("okey"), $"p_brand".as("brand")).distinct()
    val r = out.head
    val (ba, bb) = (r.getString(1), r.getString(0)) match {
      case _ => (r.getString(0), r.getString(1))
    }
    val cAb = ob.as("a").join(ob.as("b"),
        $"a.okey" === $"b.okey" && $"a.brand" === ba && $"b.brand" === bb)
      .count()
    assert(r.getLong(2) == cAb, s"pair count mismatch for ($ba,$bb): ${r.getLong(2)} vs $cAb")
    assert(out.forall(_.getLong(2) >= 3L), "min-count must hold")
    val lifts = out.map(_.getLong(5))
    assert(lifts.toSeq == lifts.sortBy(-_).toSeq, "descending lift order")
  }

  test("centroid drift: identical halves drift zero, shifted halves don't") {
    // synthetic cell: even ids identical to odd ids → split-half means agree
    val same = (0L until 8L).map(i => (i, Array.fill(4)(0.5f), 0))
      .toDF("vec_id", "embedding", "cell_id")
    def driftOf(df: org.apache.spark.sql.DataFrame): Long = {
      val comp = df.select($"cell_id", ($"vec_id" % 2 === 0).as("even"),
          posexplode($"embedding").as(Seq("dim", "x")))
        .withColumn("xm", floor(($"x".cast("double") + lit(1.0)) * 1e6).cast("long"))
      comp.groupBy($"cell_id", $"dim")
        .agg(sum(when($"even", $"xm").otherwise(0L)).as("se"),
          sum(when($"even", 1L).otherwise(0L)).as("ne"),
          sum(when(!$"even", $"xm").otherwise(0L)).as("so"),
          sum(when(!$"even", 1L).otherwise(0L)).as("no"))
        .withColumn("d", expr("(se DIV ne) - (so DIV no)"))
        .agg(sum(expr("d * d"))).head().getLong(0)
    }
    assert(driftOf(same) == 0L, "identical halves must not drift")
    val shifted = (0L until 8L).map(i =>
        (i, if (i % 2 == 0) Array.fill(4)(0.5f) else Array.fill(4)(-0.5f), 0))
      .toDF("vec_id", "embedding", "cell_id")
    assert(driftOf(shifted) == 4L * 1000000L * 1000000L,
      "a full 1.0 shift per dim must read 10^12 per dim")
    // named query sanity: one row per populated cell, non-negative metric
    val rep = IndexStore.centroidDrift(spark, sfDir).collect()
    assert(rep.nonEmpty)
    assert(rep.forall(_.getLong(3) >= 0L))
  }

  test("streaming partitioned ingest: batch ≡ stream and the sink is date-partitioned") {
    val got = StreamOps.streamPartitionedIngest(spark, sfDir,
        options = Map("maxFilesPerTrigger" -> "1"))
      .select($"event_date".cast("string").as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = Tables.events(spark, sfDir)
      .groupBy(to_date($"ts").as("event_date"))
      .agg(count(lit(1)).as("n"),
        (sum($"value".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy($"event_date")
      .select($"event_date".cast("string").as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want, s"stream ingest diverged from batch: $got vs $want")
  }
}
