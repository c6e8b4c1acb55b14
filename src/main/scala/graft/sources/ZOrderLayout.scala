package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional clustered parquet layout — the
  * 2-D generalization of [[SortedLayout]]. A 1-D range sort clusters ONE
  * column's min/max statistics; queries filtering the other dimension scan
  * everything. Interleaving the bits of two 16-bit grid coordinates gives a
  * space-filling curve along which BOTH columns vary locally, so each
  * written file covers a small bounding box in (a, b) space and parquet
  * min/max pruning skips files for predicates on EITHER or BOTH columns —
  * the mechanism behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * Same cost model as [[SortedLayout]]: one range exchange on the z-value
  * at write time (sampled split points, disjoint z-ranges per task),
  * amortized over every subsequent scan. The z-value is pure builtin long
  * arithmetic (mask-shift spreads), entirely inside whole-stage codegen —
  * no UDF on the 100 TB write path.
  */
object ZOrderLayout {

  /** 16-bit Morton spread — inserts a zero between consecutive bits via
    * the standard mask-shift construction, so two spread words interleave
    * without colliding.
    */
  private[graft] def spread16(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      .foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (v, (s, mask)) =>
        v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(mask))
      }

  /** Interleaved 32-bit z-value of two 16-bit grid coordinates (`a` takes
    * the even bit positions, `b` the odd).
    */
  def zvalue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Map a numeric column onto the 16-bit grid given inclusive bounds
    * (bounds come from one stats pass or catalog metadata — two scalars,
    * driver-bounded; out-of-bounds values clamp to the grid edge).
    */
  def coord16(x: Column, lo: Double, hi: Double): Column =
    if (hi <= lo) lit(0L)
    else least(lit(65535L), greatest(lit(0L),
      floor((x.cast("double") - lit(lo)) / lit(hi - lo) * 65535.0).cast("long")))

  /** Persist `df` z-order-clustered: `numFiles` range partitions of the
    * interleaved z-value, each internally sorted along the curve, files
    * size-bounded so a wide write emits no stragglers.
    */
  def write(df: DataFrame, path: String, za: Column, zb: Column,
            numFiles: Int = 8, maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn("zval", zvalue(za, zb))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** Named-query wrapper: write the events table z-order-clustered by
    * (user_id, value) into scratch, run a 2-D box aggregate over the
    * layout, and return the result — materialized eagerly so the scratch
    * dir is deleted before returning (same lifecycle as streamKnnSearch).
    * The coordinate bounds come from ONE stats pass (4 scalars to the
    * driver). The oracle replays the same box filter on the raw table:
    * the layout may only change what is SCANNED, never the result.
    */
  def boxQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      val e = graft.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val bounds = e.agg(min(col("user_id")), max(col("user_id")),
        min(col("value")), max(col("value"))).head()
      // Empty-events guard: all four aggregates are NULL on an empty table
      // (get* would NPE); degenerate [0,1] bounds keep the write + filter
      // flowing to the correct empty result.
      val (uLo, uHi, vLo, vHi) =
        if (bounds.isNullAt(0)) (0.0, 1.0, 0.0, 1.0)
        else (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble,
          bounds.getDouble(2), bounds.getDouble(3))
      write(e, s"$out/events_z",
        coord16(col("user_id"), uLo, uHi),
        coord16(col("value"), vLo, vHi))
      graft.Tables.storeParquet(spark, s"$out/events_z")
        .filter(col("user_id").between(4, 6) && col("value").between(10.0, 30.0))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
        .orderBy(col("event_type"))
        .localCheckpoint(true)
    } finally graft.streaming.StreamOps.rmTree(new java.io.File(out))
  }

  /** Per-file bounding boxes of the two clustered columns — the audit of
    * what min/max pruning can skip: for a box predicate, only files whose
    * box intersects it are read. Distributed, one agg over the scan.
    */
  def fileBoxes(spark: SparkSession, path: String, a: String, b: String): DataFrame =
    graft.Tables.storeParquet(spark, path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(a)).as("a_lo"), max(col(a)).as("a_hi"),
        min(col(b)).as("b_lo"), max(col(b)).as("b_hi"),
        count(lit(1)).as("rows"))
      .orderBy(col("a_lo"), col("b_lo"))
}
