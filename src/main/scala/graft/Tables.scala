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
  /** The events parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` it
    * arrives as a LongType of epoch-nanos. Convert via integer division
    * (`DIV`, not `/` — double division could round across a µs boundary) to
    * epoch-micros, matching DuckDB's ns→µs truncation exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
