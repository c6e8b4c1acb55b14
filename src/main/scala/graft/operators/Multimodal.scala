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

  /** STUB resize: deterministic byte transform standing in for an image
    * resize (real codec drops into the same bytes→bytes slot). Keeps the
    * contract visible: output length scales with the target box.
    */
  def fakeResize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(1, math.min(if (bytes == null) 1 else bytes.length, w * h / 64))
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = bytes(i % bytes.length); i += 1 }
    out
  }

  /** Batched partition-local resize (bytes→bytes), same batching shape as
    * [[decodeMeta]].
    */
  def resize(df: DataFrame, binCol: String, w: Int, h: Int,
             batchSize: Int = 32): DataFrame = {
    val outSchema = df.schema.add(StructField("resized", BinaryType, nullable = false))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          Row.fromSeq(r.toSeq :+ fakeResize(r.getAs[Array[Byte]](idx), w, h))
        }
      }
    }
  }

  /** STUB frame sampling: a "video" binary column yields every nth chunk as
    * a frame (real demuxer drops into the same bytes→frames slot). The
    * Spark-side shape — one input row explodes to frameCount typed rows —
    * is the real contract.
    */
  def frameSample(df: DataFrame, binCol: String, frameBytes: Int = 64,
                  everyNth: Int = 4): DataFrame =
    df.withColumn("frame",
        explode(expr(
          s"transform(sequence(0, greatest(int(octet_length($binCol) / ($frameBytes * $everyNth)) - 1, 0)), " +
            s"i -> struct(i AS frame_no, substring($binCol, i * $frameBytes * $everyNth + 1, $frameBytes) AS frame_bytes))")))
      .select(col("doc_id"), col("frame.frame_no").as("frame_no"),
        octet_length(col("frame.frame_bytes")).as("frame_len"))

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

  /** Named query: frame sampling over the binary column (oracle-checked:
    * frame boundaries are pure byte arithmetic on both engines).
    */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(withBinary(spark, dir).select(col("doc_id"), col("media")), "media")
      .orderBy(col("doc_id"), col("frame_no"))

  /** Named query: batched resize; the stub's output length is a pure
    * function of input bytes so the oracle can check it.
    */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resize(withBinary(spark, dir).select(col("doc_id"), col("media")), "media", 64, 64)
      .select(col("doc_id"), octet_length(col("resized")).as("resized_len"))
      .orderBy(col("doc_id"))
}
