package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.types._

/** Deterministic text featurizer: the engine's stand-in for the reference's
  * sentence-transformer encode step (`FAISS/PlainDemo/pipeline.py:62,313`;
  * `Milvus/stream1.py:91-93`, batch_size=32 at `:19,:93`).
  *
  * No model downloads are possible in this environment, so we use signed
  * feature hashing of character trigrams (Weinberger et al. 2009, "Feature
  * Hashing for Large Scale Multitask Learning"): each trigram hashes to a
  * dimension and a sign, the vector is L2-normalized. This preserves the
  * contract the engine relies on: fixed dimension, deterministic per text,
  * similar strings ⇒ similar vectors, ‖v‖₂ = 1 (so inner product == cosine,
  * mirroring `pipeline.py:237-240`).
  */
object Featurizer {
  val DefaultDim = 64

  /** FNV-1a 32-bit over a char window — stable across JVMs, cheap. */
  private def fnv1a(s: String, from: Int, len: Int): Int = {
    var h = 0x811c9dc5
    var i = from
    val end = from + len
    while (i < end) {
      h ^= s.charAt(i).toInt
      h *= 0x01000193
      i += 1
    }
    h
  }

  /** Embed one text: signed hashed char-trigrams, L2-normalized. `salt`
    * names the "model": a non-empty salt perturbs every trigram window, so
    * two same-dim models still define distinct vector spaces (the role the
    * reference's different checkpoints play). Empty salt = the historical
    * hash space, bit-identical to pre-salt builds.
    */
  def embed(text: String, dim: Int = DefaultDim, salt: String = ""): Array[Float] = {
    val v = new Array[Float](dim)
    val body = if (text == null) "" else text.toLowerCase
    val s = " " + (if (salt.isEmpty) body else salt + ":" + body) + " "
    var i = 0
    val n = s.length - 3
    while (i <= n) {
      val h = fnv1a(s, i, 3)
      val idx = math.floorMod(h, dim)
      v(idx) += (if ((h & 0x80000000) == 0) 1f else -1f)
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += v(j).toDouble * v(j).toDouble; j += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      j = 0
      while (j < dim) { v(j) *= inv; j += 1 }
    }
    v
  }

  /** Column form (codegen'd call site; the function itself is a Scala UDF —
    * acceptable here because embedding is genuinely imperative per-row work,
    * the same boundary the reference crosses into torch).
    */
  def embedUdf(dim: Int = DefaultDim): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => embed(t, dim))

  /** mapPartitions variant that processes rows in batches of `batchSize`,
    * mirroring the reference's `encode(batch_size=32)` call shape
    * (`Milvus/stream1.py:19,93`) — the pattern a real model-serving UDF
    * would need (amortize per-batch setup), kept here so the plumbing is
    * exercised and tested.
    */
  def embedBatched(df: DataFrame, textCol: String, outCol: String,
                   dim: Int = DefaultDim, batchSize: Int = 32,
                   salt: String = ""): DataFrame = {
    val schema = df.schema.add(StructField(outCol, ArrayType(FloatType, containsNull = false)))
    implicit val enc: Encoder[Row] = Encoders.row(schema)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch
        val vecs = batch.map(r => embed(r.getString(idx), dim, salt))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }
  }
}
