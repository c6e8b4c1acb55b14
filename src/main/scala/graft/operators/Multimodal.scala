package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (LLM-pipeline north star): media as opaque
  * BINARY columns + typed metadata, with decode / feature-extraction as
  * batched partition-local functions.
  *
  * No image/audio codecs exist in this container, so the decode step is a
  * clearly-marked deterministic STUB (`fakeDecode`) — the Spark-side
  * contract (schema, batch shape, partition locality, null handling) is
  * real and tested, and a production codec drops into the same slot.
  */
object Multimodal {

  /** Typed media metadata, the struct a real decoder would emit. */
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** STUB decoder: deterministic fake metadata derived from the bytes.
    * Replace with a real codec (e.g. javax.imageio) in production — the
    * signature (bytes → meta) is the real contract.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
    val n = if (bytes == null) 0 else bytes.length
    val h = if (n == 0) 0 else java.util.Arrays.hashCode(bytes)
    (256 + math.floorMod(h, 1024), 256 + math.floorMod(h >> 10, 1024),
      if (n % 2 == 0) "png" else "jpeg")
  }

  /** Documents with a BINARY media column (UTF-8 bytes of the text stand in
    * for the opaque blob) — the ingest shape for multimodal tables.
    */
  def withBinary(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("media", col("text").cast("binary"))

  /** Batched partition-local decode: mapPartitions in groups of 32 (the
    * batch shape a GPU/codec UDF needs), emitting the typed meta struct.
    */
  def decodeMeta(df: DataFrame, binCol: String, batchSize: Int = 32): DataFrame = {
    val outSchema = df.schema
      .add(StructField("meta", metaSchema, nullable = false))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val metas = batch.map(r => fakeDecode(r.getAs[Array[Byte]](idx)))
        batch.iterator.zip(metas.iterator).map { case (r, (w, h, f)) =>
          Row.fromSeq(r.toSeq :+ Row(w, h, f))
        }
      }
    }
  }

  /** Named query: binary-column metadata projection. The oracle checks the
    * engine-agnostic parts (byte length, first code point); the stubbed
    * decode fields are covered by MultimodalSpec.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    withBinary(spark, dir)
      .select(col("doc_id"),
        octet_length(col("media")).as("n_bytes"),
        ascii(col("text")).as("first_cp"))
      .orderBy(col("doc_id"))
}
