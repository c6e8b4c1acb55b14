package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` columns, expressed with Spark's built-in
  * higher-order functions so the whole computation stays inside Catalyst
  * (no UDF serialization boundary, spill-safe, partition-parallel).
  *
  * Re-expresses the reference's numpy/faiss vector kernels:
  *  - L2 normalization: `FAISS/PlainDemo/pipeline.py:62-63,313-314`
  *  - inner product == cosine on normalized vectors: `FAISS/PlainDemo/pipeline.py:237-240`
  *  - L2 distance (FAISS METRIC_L2): `FAISS/PlainDemo/pipeline.py:319`
  *
  * All folds accumulate in IEEE double, strictly left-to-right (Spark's
  * `aggregate` is a sequential fold per row), which makes results bit-exact
  * reproducible and lets the DuckDB oracle mirror them with `list_reduce`.
  */
object VectorFunctions {

  /** ARRAY<FLOAT> → ARRAY<DOUBLE>; float→double widening is exact. */
  def vecD(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential left-fold sum of an ARRAY<DOUBLE>. */
  def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product ⟨a,b⟩ in double precision — codegen'd native loop
    * (see graft.expressions.VectorExpressions; bit-identical to [[dotHof]]).
    */
  def dot(a: Column, b: Column): Column = graft.expressions.VectorExpressions.dotF(a, b)

  /** Euclidean norm ‖a‖₂ — codegen'd. */
  def norm2(a: Column): Column = graft.expressions.VectorExpressions.norm2F(a)

  /** L2 distance ‖a−b‖₂ (FAISS METRIC_L2 semantics) — codegen'd. */
  def l2Distance(a: Column, b: Column): Column = sqrt(l2DistanceSq(a, b))

  /** Cosine similarity for arbitrary (not necessarily normalized) vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Unit-normalize a / ‖a‖₂ (zero vector unchanged) — codegen'd. */
  def l2Normalize(a: Column): Column = graft.expressions.VectorExpressions.l2normF(a)

  /** Squared L2 distance (cheaper; monotone in l2Distance for top-k). */
  def l2DistanceSq(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.l2SqF(a, b)

  // Higher-order-function formulations of the same kernels. Kept as the
  // readable reference semantics; VectorExpressionsSpec asserts the codegen
  // versions above are bit-identical (same left-to-right double fold).
  def dotHof(a: Column, b: Column): Column =
    foldSum(zip_with(vecD(a), vecD(b), (x, y) => x * y))
  def norm2Hof(a: Column): Column =
    sqrt(foldSum(transform(vecD(a), x => x * x)))
  def l2DistanceSqHof(a: Column, b: Column): Column =
    foldSum(zip_with(vecD(a), vecD(b), (x, y) => (x - y) * (x - y)))

  /** Sign-bit locality-sensitive hash bucket: bit i set iff v[i] > 0
    * (i in [0, bits)). A deterministic, SQL-expressible stand-in for the
    * random-hyperplane LSH family — on L2-normalized inputs, vectors in the
    * same bucket agree on the signs of their first `bits` coordinates, a
    * standard blocking key for approximate cosine search.
    */
  def signLshBucket(v: Column, bits: Int): Column = signLshBucketAt(v, 0, bits)

  /** Sign-LSH bucket over coordinates [offset, offset+bits): the per-band
    * key for banded (OR-amplified) blocking — each band reads a disjoint
    * coordinate slice, so band keys are independent projections.
    */
  def signLshBucketAt(v: Column, offset: Int, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(v, offset + i + 1).cast("double") > 0.0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** floor(1e6 * x) as BIGINT — the fixed-point projection used to compare
    * floating results against the DuckDB oracle without fp-formatting noise.
    */
  def micro(x: Column): Column = floor(x * lit(1000000.0)).cast("long")
}
