package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata (see TESTDATA.md): TPC-H-ish star schema
  * plus `events` (stream-shaped), `documents` (text corpus) and `embeddings`
  * (vector table, ARRAY<FLOAT> dim 64, L2-normalized).
  *
  * All reads are plain parquet scans so Catalyst predicate pushdown and
  * column pruning apply to every downstream query.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The driver regenerates the testdata between rounds and the `ts`
    * physical type has varied across generations, so the reader normalizes
    * every flavor to a session-tz TIMESTAMP (every graft session pins UTC,
    * and DuckDB treats the naive values as UTC — same epoch either way):
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    *    LongType of epoch-nanos, converted via integer division (`DIV`,
    *    not `/` — double division could round across a µs boundary) to
    *    epoch-micros, matching DuckDB's ns→µs truncation exactly;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ, which downstream epoch casts reject — cast to
    *    TIMESTAMP (UTC session tz ⇒ identical instant);
    *  - TIMESTAMP(MICROS, adjusted): already the target type.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  /** Flavor-adaptive `ts` normalization shared by the batch reader and the
    * streaming events source (StreamOps.readEventsStream).
    */
  def normalizeTs(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      raw.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Cheap content fingerprint of a data dir: a fold over every file's
    * path, length, and mtime (recursive — the table dirs are shallow and
    * contain a handful of parquet part-files, so this is a metadata-only
    * driver-side walk). Shared by every persisted derived artifact
    * (sketch exports, IVF/PQ/graph index stores) so that regenerated
    * source data invalidates the artifact instead of serving stale
    * derivations — the driver rebuilds the testdata between rounds, and
    * an existence-only `ensure` would keep probing an index built from a
    * corpus that no longer exists.
    */
  private[graft] def dirFingerprint(dir: String): Long = Profiling.timed("dirFingerprint") {
    def walk(f: java.io.File): Iterator[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).iterator.flatMap(_.iterator).flatMap(walk)
      else Iterator.single(f)
    // Sorted so the fold is independent of listFiles() enumeration order
    // (unspecified per the JDK), and folded with a tail-bytes content token
    // so a regeneration that preserves every file's size within the
    // filesystem's mtime granularity still flips the fingerprint.
    walk(new java.io.File(dir)).toArray.sortBy(_.getPath).foldLeft(17L) { (acc, f) =>
      (((acc * 31 + f.getPath.hashCode) * 31 + f.length()) * 31 + f.lastModified()) * 31 + tailToken(f)
    }
  }

  /** Ceiling on ids a search path may collect to the driver and inline as
    * a literal IN filter. Below it, inlining wins: the id list pushes into
    * the parquet scan (`PushedFilters: [In(...)]`) and prunes row groups.
    * Above it — the reference batches up to 30k queries, and nq·beam or
    * nq·rerank literal lists become ~10⁶-term plans — the same candidate
    * set must stay distributed and join (broadcast semi-join on ids)
    * instead. Every collect-and-inline site checks this bound rather than
    * relying on small-nq convention.
    */
  private[graft] val MaxInlineIds: Int = 10000

  /** Hint-broadcast a frame only while its COUNTED size fits the bound —
    * the conditional twin of the [[MaxInlineIds]] inline contract, for
    * join sides that are "usually tiny" but corpus-proportional in the
    * worst case (tombstone/dead sets: real deletes are a sliver, a bulk
    * delete can tombstone a corpus-scale slice). An unconditional
    * `broadcast()` hint overrides AQE and forces a driver-side hash
    * relation of whatever the set happens to be; this helper
    * localCheckpoints the frame (every caller consumes it at least once
    * more, so the materialization is shared, and checkpointing erases
    * the naive size estimate that would otherwise let the static planner
    * re-broadcast it), counts it, and hints only within the bound. Past
    * the bound the frame stays distributed and the join degrades to a
    * shuffled anti-join — correct at any delete volume, with AQE free to
    * re-pick from true runtime sizes.
    */
  private[graft] def boundedBroadcast(df: DataFrame,
                                      bound: Long = MaxInlineIds.toLong): DataFrame = {
    val d = df.localCheckpoint()
    if (d.count() <= bound) org.apache.spark.sql.functions.broadcast(d) else d
  }

  /** Last 8 bytes of the file as one long — for parquet that is the 4-byte
    * footer length plus the "PAR1" magic, and the footer length moves with
    * any row-group/statistics change, making this a content token at the
    * cost of a single seek+read per file.
    */
  private def tailToken(f: java.io.File): Long = {
    val len = f.length()
    if (len < 8) len
    else {
      val raf = new java.io.RandomAccessFile(f, "r")
      try { raf.seek(len - 8); raf.readLong() } finally raf.close()
    }
  }
}
