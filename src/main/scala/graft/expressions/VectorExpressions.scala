package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd kernels for `ARRAY<FLOAT>` vector math — the engine's
  * hot path (every kNN candidate scores one dot product;
  * `FAISS/PlainDemo/pipeline.py:238` does this inside FAISS C++).
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) evaluate the
  * lambda interpreted per element — fine for correctness, ~10-50× too slow
  * for scoring millions of candidates. These expressions emit a tight Java
  * loop into whole-stage codegen instead, with the SAME arithmetic as the
  * HOF formulation: strict left-to-right double accumulation, so results
  * are bit-identical to the `aggregate(zip_with(...))` form and to the
  * DuckDB oracle's sequential `list_reduce`.
  */
object VectorExpressions {
  def dotF(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2SqF(a: Column, b: Column): Column =
    ExpressionUtils.column(L2DistanceSqFloat(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def norm2F(a: Column): Column =
    ExpressionUtils.column(Norm2Float(ExpressionUtils.expression(a)))

  def dotL(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def l2normF(a: Column): Column =
    ExpressionUtils.column(L2NormalizeFloat(ExpressionUtils.expression(a)))
}

/** ⟨a,b⟩ over float arrays, accumulated left-to-right in double.
  * Equal-length inputs required: a length mismatch raises rather than
  * silently scoring a truncated prefix (the HOF `zip_with` form would
  * yield NULL there — neither is a meaningful similarity, so fail fast).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorKernels.checkDims(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = graft.expressions.VectorKernels.checkDims($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** ⟨a,b⟩ over BIGINT code arrays — the scoring kernel for scalar-quantized
  * vectors (integer arithmetic: exact, fold-order-independent, and
  * trivially mirrored by any SQL engine). Equal-length inputs required.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorKernels.checkDims(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = graft.expressions.VectorKernels.checkDims($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Shared helper callable from both interpreted eval and generated Java:
  * equal-dimension precondition for the binary vector kernels.
  */
object VectorKernels {
  def checkDims(a: Int, b: Int): Int = {
    if (a != b)
      throw new IllegalArgumentException(s"vector dimension mismatch: $a vs $b")
    a
  }
}

/** ‖a−b‖₂² over float arrays (monotone in L2 — the top-k scoring form).
  * Equal-length inputs required (see [[DotProductFloat]]).
  */
case class L2DistanceSqFloat(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VectorKernels.checkDims(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = graft.expressions.VectorKernels.checkDims($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceSqFloat =
    copy(left = newLeft, right = newRight)
}

/** ‖a‖₂ over a float array. */
case class Norm2Float(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Norm2Float =
    copy(child = newChild)
}

/** a / ‖a‖₂ over a float array — the unit-normalize every cosine index
  * wants at ingest (reference: FAISS `normalize_L2` before `IndexFlatIP`,
  * `FAISS/PlainDemo/pipeline.py:229-236`). The zero vector has no
  * direction; it is returned unchanged (norm 0 ⇒ inv = 1), matching the
  * `transform(v, x -> x / nullif(norm,0))`-with-coalesce HOF form the
  * engine would otherwise use. Codegen emits one tight two-pass loop and
  * wraps the result as an UnsafeArrayData over a primitive float[].
  */
case class L2NormalizeFloat(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    val inv = if (s == 0.0) 1.0 else 1.0 / math.sqrt(s)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = (x.getFloat(i).toDouble * inv).toFloat; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val inv = ctx.freshName("inv")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = (double) $a.getFloat($i);
         |  $s += v * v;
         |}
         |double $inv = ($s == 0.0) ? 1.0 : 1.0 / java.lang.Math.sqrt($s);
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (float) (((double) $a.getFloat($i)) * $inv);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormalizeFloat =
    copy(child = newChild)
}
