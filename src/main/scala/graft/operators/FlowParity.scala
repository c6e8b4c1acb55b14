package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Packet-flow pipeline parity (SURVEY.md §2.1–2.2): the reference's CSV →
  * clean → document-text dataflow re-expressed on the testdata.
  *
  * The reference's base table is a Wireshark flow CSV
  * (`FAISS/PlainDemo/pipeline.py:268-277`); here the same operators run over
  * the `events` table (same shape: id, time, categorical, payload), plus a
  * synthetic-packet generator mirroring `pipeline.py:329-339`.
  */
object FlowParity {

  /** All-string flow schema (S1: `dtype=str` at `pipeline.py:275`). */
  val flowSchema: StructType = StructType(Seq(
    "frame_number", "frame_time", "ip_src", "ip_dst",
    "tcp_srcport", "tcp_dstport", "protocol", "frame_len"
  ).map(StructField(_, StringType, nullable = true)))

  /** S1: CSV scan with forced-string schema. */
  def readFlowCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(flowSchema).csv(path)

  /** S2: inferred-schema CSV read — the Milvus loader's `pd.read_csv`
    * dtype inference (`Milvus/stream1.py:209`). Provided for reference
    * parity; the engine's DEFAULT ingest stays explicit StructType +
    * try_cast (SURVEY §1.2) because inference costs an extra full pass
    * over the file, and at 100 TB one malformed shard silently flips a
    * column's type for the whole table — the explicit path turns the same
    * rows into per-row nulls instead (see [[cleanCast]]).
    */
  def readFlowCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** P1: null-safe document-text concat — pandas `fillna('') + " "`
    * (`pipeline.py:280-288`). The reference concatenates the protocol column
    * twice (`:283,:286`); replicated deliberately with event_type.
    */
  def packetText(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        concat_ws(" ",
          coalesce(col("event_id").cast("string"), lit("")),
          coalesce(col("user_id").cast("string"), lit("")),
          coalesce(col("event_type"), lit("")),
          coalesce(col("event_type"), lit("")), // duplicated, as in pipeline.py:283,286
          coalesce(col("props"), lit(""))).as("packet_text"))
      .orderBy(col("event_id"))

  /** P3/P4/D1: the Milvus cleaning chain (`Milvus/stream1.py:212-215,262-265`):
    * numeric coercion with null-on-failure (try_cast ≡ pd.to_numeric
    * errors='coerce'), drop-null on key, keep-first dedup on key.
    */
  def cleanCast(spark: SparkSession, dir: String): DataFrame = {
    val parsed = Tables.events(spark, dir)
      .withColumn("k_raw", regexp_extract(col("props"), "\"k\": (\\d+)", 1))
      .withColumn("k", col("k_raw").try_cast("bigint"))
      .na.drop(Seq("k"))
    val w = Window.partitionBy(col("k")).orderBy(col("event_id"))
    parsed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("k"), col("event_id"), col("event_type"))
      .orderBy(col("k"))
  }

  /** S8: synthetic packet generator (`pipeline.py:329,334,339` f-string rows
    * `192.168.1.{i} ... TCP {i*10}`), as a generated-columns range scan —
    * no driver-side loop, scales to any n.
    */
  def synthPackets(spark: SparkSession, n: Int = 500): DataFrame =
    spark.range(n.toLong).toDF("i").select(
      col("i").as("frame_number"),
      format_string("192.168.1.%d", col("i") % 256).as("ip_src"),
      format_string("10.0.0.%d", col("i") % 200).as("ip_dst"),
      ((col("i") * 10) % 60000 + 1000).as("port"),
      element_at(array(lit("TCP"), lit("UDP"), lit("DNS"), lit("ICMP"), lit("ARP")),
        (col("i") % 5 + 1).cast("int")).as("protocol"),
      format_string("%d 192.168.1.%d TCP packet %d", col("i"), col("i") % 256, col("i") * 10)
        .as("packet_text"))
      .orderBy(col("frame_number"))

  /** A1: per-operation summary stats (`FAISS/UI-Demo/pipeline+ui.py:77-90`:
    * count/mean/min/max/sum per operation type) — value sums in DECIMAL for
    * cross-engine exactness; min/max are order-independent doubles.
    */
  def metricsSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("sum_value_c"))
      .orderBy(col("event_type"))

  /** A2: two-level benchmark reduce (`Milvus/stream1.py:154-191`: per-query
    * reduce then cross-query reduce — here per-(type,user) sums, then
    * per-type max/count/sum of those).
    */
  def metricsTwoLevel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("user_sum"))
      .groupBy(col("event_type"))
      .agg((max(col("user_sum")) * 100).cast("long").as("max_user_sum_c"),
        count(lit(1)).as("n_users"),
        (sum(col("user_sum")) * 100).cast("long").as("total_c"))
      .orderBy(col("event_type"))

  /** S3: offset-resume scan — the reference's chunked CSV tail
    * (`Milvus/stream1.py:251-260`: `skiprows = num_entities+1`,
    * `nrows=1000`). File order becomes key order; the next chunk is
    * offset+limit over it.
    */
  def offsetResume(spark: SparkSession, dir: String,
                   offset: Int = 500, n: Int = 1000): DataFrame =
    Tables.events(spark, dir)
      .orderBy(col("event_id"))
      .offset(offset)
      .limit(n)
      .select(col("event_id"), col("event_type"))

  /** P4 typed twin: schema-declared JSON extraction. [[cleanCast]] parses
    * `props` with a regex (the reference's string munging); the idiomatic
    * Spark form is `from_json` with an explicit schema — typed, null-safe
    * on malformed input, and codegen'd, with the parse visible to Catalyst
    * instead of hidden in a regex.
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("j", from_json(col("props"), StructType(Seq(StructField("k", LongType)))))
      .select(col("event_id"), col("j.k").as("k"))
      .orderBy(col("event_id"))

  /** Text normalization (the first stage of every LLM data pipeline):
    * lowercase, strip non-alphanumerics, squeeze whitespace — pure codegen
    * string expressions over the synthetic packet text (which carries
    * punctuation worth stripping).
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame =
    synthPackets(spark, 500)
      .select(col("frame_number"),
        trim(regexp_replace(
          regexp_replace(lower(col("packet_text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm_text"))
      .orderBy(col("frame_number"))

  /** S3 scale-safe twin of [[offsetResume]]: keyed watermark resume.
    * `offset()` after a global sort funnels the whole prefix through one
    * task at deep offsets; resuming from the last-seen key instead pushes a
    * range predicate into the parquet scan (`PushedFilters: GreaterThan`)
    * and plans the limit as TakeOrderedAndProject — no single-partition
    * stage at any resume point. Same contract as the reference's chunked
    * tail (`Milvus/stream1.py:251-260`: resume at `num_entities+1`) when
    * file order == key order, which is how its `skiprows` is used.
    */
  def resumeKeyed(spark: SparkSession, dir: String,
                  lastSeen: Long = 500, n: Int = 1000): DataFrame =
    Tables.events(spark, dir)
      .filter(col("event_id") > lastSeen)
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
      .limit(n)

  /** P10: string split + positional field extraction
    * (`pipeline+ui.py:643-646` `text.split()[2]` → protocol).
    */
  def splitExtract(spark: SparkSession, dir: String): DataFrame =
    synthPackets(spark, 500)
      .select(col("frame_number"),
        element_at(split(col("packet_text"), " "), 3).as("field3"))
      .orderBy(col("frame_number"))
}
