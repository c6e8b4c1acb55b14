package graft.embed

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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
/** Typed (id, vec) embedding row — top-level so the product encoder's
  * codegen sees a stable class (nested case classes trip it, see
  * SparkSpec notes), with `Array[Float]` hitting the primitive-array
  * fast path (UnsafeArrayData, no per-element boxing).
  */
case class IdVec(id: Long, vec: Array[Float])

/** Typed (model, id, vec) row for multi-model sweeps — one scan carries
  * every model's embedding space as a column instead of one plan branch per
  * model (168 tiny branches was the measured bottleneck: ~0.2 s fixed
  * overhead each).
  */
case class ModelIdVec(model: String, id: Long, vec: Array[Float])

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

  /** Typed fast path: (id, text) → Dataset[IdVec]. The generic
    * [[embedBatched]] keeps arbitrary input columns but pays the Row
    * encoder's per-element float boxing; high-volume callers (the op-size
    * sweep embeds ~10⁶ rows per run) use this primitive-array encoder
    * instead — same batch shape, same embedding.
    */
  def embedBatchedTyped(df: DataFrame, idCol: String, textCol: String,
                        dim: Int = DefaultDim, batchSize: Int = 32,
                        salt: String = ""): Dataset[IdVec] = {
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    implicit val enc: Encoder[IdVec] = Encoders.product[IdVec]
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch
        val vecs = batch.map(r => embed(r.getString(txtIdx), dim, salt))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          IdVec(r.getLong(idIdx), v)
        }
      }
    }
  }

  /** Multi-model variant: each row names its model (salt) in `modelCol`;
    * `dims` maps model → output dimension. Rows within a batch are grouped
    * by model so the "one model call per batch" boundary holds per model.
    * One scan embeds every model's space — the sweep fan-out is a COLUMN,
    * not a plan branch per model.
    */
  def embedSweepTyped(df: DataFrame, modelCol: String, idCol: String,
                      textCol: String, dims: Map[String, Int],
                      batchSize: Int = 32): Dataset[ModelIdVec] = {
    val mIdx = df.schema.fieldIndex(modelCol)
    val idIdx = df.schema.fieldIndex(idCol)
    val txtIdx = df.schema.fieldIndex(textCol)
    implicit val enc: Encoder[ModelIdVec] = Encoders.product[ModelIdVec]
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.groupBy(_.getString(mIdx)).iterator.flatMap { case (m, rows) =>
          // one "model call" per (batch, model)
          val dim = dims(m)
          rows.iterator.map(r => ModelIdVec(m, r.getLong(idIdx), embed(r.getString(txtIdx), dim, m)))
        }
      }
    }
  }
}
