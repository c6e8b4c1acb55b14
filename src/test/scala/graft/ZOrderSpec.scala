package graft

import org.apache.spark.sql.functions._
import graft.sources.ZOrderLayout

/** Z-order clustered layout: the Morton interleave itself (against an
  * independent bit-loop), the pruning property (per-file bounding boxes in
  * BOTH dimensions shrink, so a 2-D box predicate touches a strict subset
  * of files — which a 1-D range layout cannot give for the second column),
  * and result invariance of the box query.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue matches an independent per-bit Morton interleave") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (12345L, 54321L), (65535L, 65535L), (40000L, 7L))
    val got = samples.toDF("a", "b")
      .select(ZOrderLayout.zvalue($"a", $"b").as[Long]).collect()
    val want = samples.map { case (a, b) => mortonRef(a, b) }
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }

  test("z-layout clusters BOTH dimensions: a 2-D box touches a strict file subset") {
    val out = s"/tmp/graft_zorder_${System.nanoTime()}"
    try {
      val e = Tables.events(spark, sfDir).select($"event_id", $"user_id", $"value")
      val b = e.agg(min($"user_id"), max($"user_id"), min($"value"), max($"value")).head()
      ZOrderLayout.write(e, out,
        ZOrderLayout.coord16($"user_id", b.getLong(0).toDouble, b.getLong(1).toDouble),
        ZOrderLayout.coord16($"value", b.getDouble(2), b.getDouble(3)),
        numFiles = 8, maxRecordsPerFile = 200L)
      val boxes = ZOrderLayout.fileBoxes(spark, out, "user_id", "value")
        .select($"a_lo".as[Long], $"a_hi".as[Long], $"b_lo".as[Double], $"b_hi".as[Double])
        .collect()
      assert(boxes.length >= 4, s"expected >=4 files, got ${boxes.length}")
      // the box predicate of the named query
      val touched = boxes.count { case (aLo, aHi, bLo, bHi) =>
        aLo <= 6 && aHi >= 4 && bLo <= 30.0 && bHi >= 10.0
      }
      assert(touched < boxes.length,
        s"2-D pruning must skip at least one file: $touched/${boxes.length} touched")
      // and the second dimension genuinely clusters: some file's value
      // span is a strict sub-range of the global one (impossible in a
      // user_id-only sort where every file spans all values)
      val (gLo, gHi) = (b.getDouble(2), b.getDouble(3))
      assert(boxes.exists { case (_, _, lo, hi) => lo > gLo || hi < gHi },
        "no file narrowed the value dimension — not z-clustered")
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(out))
  }

  test("box query over the z-layout equals the raw-table box aggregate") {
    val got = ZOrderLayout.boxQuery(spark, sfDir)
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    val want = Tables.events(spark, sfDir)
      .filter($"user_id".between(4, 6) && $"value".between(10.0, 30.0))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        (sum($"value".cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy($"event_type")
      .select($"event_type".as[String], $"n".as[Long], $"sum_value_c".as[Long])
      .collect().toSeq
    assert(got == want, s"layout changed the result: $got vs $want")
    assert(got.nonEmpty, "box must be non-empty at test scale")
  }
}
