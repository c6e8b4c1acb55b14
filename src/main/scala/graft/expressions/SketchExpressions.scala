package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sketch kernels over token-hash arrays (`ARRAY<BIGINT>`).
  *
  * The HOF formulations (one interpreted `aggregate` fold per hash
  * function / per bit — 64 or 32 passes per document) are kept in
  * graft.operators.Dedup as the reference semantics; these single-pass
  * loops produce identical values (same integer arithmetic) and are what
  * a 100 TB corpus sweep actually runs.
  */
object SketchExpressions {
  def minhash(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(hashes), a, b))

  def simhash(hashes: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashSketch(ExpressionUtils.expression(hashes), bits))
}

/** MinHash signature: out[j] = min over h of (a(j)·(h mod m) + b(j)) mod m,
  * m = 2³¹−1 — one pass over the hash array (Broder 1997 permutation family,
  * same formula as Dedup.minhashSignatures' per-column folds).
  */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(a.length == b.length)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val m = 0x7fffffffL

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val k = a.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val hm = hs.getLong(i) % m
      var j = 0
      while (j < k) {
        val v = (a(j) * hm + b(j)) % m
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val aRef = ctx.addReferenceObj("mhA", a, "long[]")
      val bRef = ctx.addReferenceObj("mhB", b, "long[]")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val n = ctx.freshName("n")
      s"""
         |long[] $sig = new long[${a.length}];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $n = $input.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hm = $input.getLong($i) % ${m}L;
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    long $v = ($aRef[$j] * $hm + $bRef[$j]) % ${m}L;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SimHash (Charikar 2002): bit i of the output = sign of Σ over tokens of
  * (bit i of token hash ? +1 : −1) — one pass, matching Dedup.simhash's
  * per-bit folds ( (h>>i)%2 != 0 ⇔ (h>>i)&1 != 0 for all signs ).
  */
case class SimHashSketch(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](bits)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >> j) & 1L) != 0L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[$bits];
         |int $n = $input.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $input.getLong($i);
         |  for (int $j = 0; $j < $bits; $j++) {
         |    $votes[$j] += ((($h >> $j) & 1L) != 0L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < $bits; $j++) {
         |  if ($votes[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)
}
