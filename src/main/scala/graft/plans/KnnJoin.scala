package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.types.{DoubleType, LongType}

/** The engine's whole-operator Catalyst extension: an exact kNN join as a
  * first-class plan node (`index.search(q, k)` batch shape,
  * `FAISS/PlainDemo/pipeline.py:232-263`), planned by [[KnnJoinStrategy]]
  * into [[KnnJoinExec]].
  *
  * Physical algorithm — the shape that survives 100 TB:
  *   1. the query side (small by contract) is collected and broadcast;
  *   2. one pass over base partitions keeps a bounded per-query heap of
  *      size k (so a partition contributes at most nq·k candidates, not
  *      its row count);
  *   3. the per-partition winners (≤ partitions·nq·k tiny rows) are merged
  *      by a keyed aggregate into the global top-k.
  *
  * Contrast with the declarative form (crossJoin → window row_number ≤ k):
  * same results (same (sim desc, vec_id) total order), but the shuffle
  * carries only heap winners instead of every scored row. Spark ≥3.5's
  * WindowGroupLimit approximates step 2; this node makes the bound
  * explicit and fuses scoring into the scan pass.
  *
  * Left child: queries (qid BIGINT, qvec ARRAY<FLOAT>).
  * Right child: base (vec_id BIGINT, embedding ARRAY<FLOAT>).
  * Output: (qid BIGINT, vec_id BIGINT, sim DOUBLE), unranked.
  */
case class KnnJoin(left: LogicalPlan, right: LogicalPlan, k: Int,
                   excludeSelf: Boolean,
                   // constructor param (not a body val): withNewChildren's
                   // copy() must preserve the output exprId or downstream
                   // references dangle
                   simAttr: AttributeReference =
                     AttributeReference("sim", DoubleType, nullable = false)())
    extends BinaryNode {
  override def output: Seq[Attribute] =
    Seq(left.output.head, right.output.head, simAttr)
  // Declare we consume every child column — keeps ColumnPruning from
  // stripping the embedding arrays out from under an "expressionless" node.
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): KnnJoin =
    copy(left = newLeft, right = newRight)
}

object KnnJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: KnnJoin =>
      KnnJoinExec(planLater(j.left), planLater(j.right), j.k, j.excludeSelf, j.output) :: Nil
    case _ => Nil
  }
}

case class KnnJoinExec(queries: SparkPlan, base: SparkPlan, k: Int,
                       excludeSelf: Boolean, output: Seq[Attribute])
    extends BinaryExecNode {
  override def left: SparkPlan = queries
  override def right: SparkPlan = base
  // sim is minted here, not read from a child — declare it produced or the
  // tree printer flags the node as missing input ("!" marker)
  override def producedAttributes: AttributeSet = AttributeSet(Seq(output.last))

  /** Worst-first ordering for the bounded heap: head = lowest sim, ties
    * broken toward the larger vec_id — the element the next better
    * candidate evicts. Mirrors the window form's (sim desc, vec_id asc).
    */
  private type Cand = (Double, Long) // (sim, vec_id)
  private val worstFirst: Ordering[Cand] =
    Ordering.by((c: Cand) => (-c._1, c._2))

  override protected def doExecute(): RDD[InternalRow] = {
    val qRows = queries.executeCollect().map { r =>
      (r.getLong(0), r.getArray(1).toFloatArray())
    }
    val bc = sparkContext.broadcast(qRows)
    val kk = k
    val self = excludeSelf

    // Pass 1: per-partition bounded heaps.
    val localTopK: RDD[(Long, Array[Cand])] = base.execute().mapPartitions { it =>
      val qs = bc.value
      val heaps = qs.map(_ => new scala.collection.mutable.PriorityQueue[Cand]()(worstFirst))
      it.foreach { row =>
        val vecId = row.getLong(0)
        val emb = row.getArray(1)
        var qi = 0
        while (qi < qs.length) {
          val (qid, qvec) = qs(qi)
          if (!(self && vecId == qid)) {
            var s = 0.0
            var i = 0
            // Equal-dim precondition, enforced: a truncated dot product is
            // not a similarity (mirrors DotProductFloat's fail-fast).
            val n = graft.expressions.VectorKernels.checkDims(qvec.length, emb.numElements())
            while (i < n) { s += qvec(i).toDouble * emb.getFloat(i).toDouble; i += 1 }
            val h = heaps(qi)
            if (h.size < kk) h.enqueue((s, vecId))
            else if (worstFirst.lt((s, vecId), h.head)) { h.dequeue(); h.enqueue((s, vecId)) }
          }
          qi += 1
        }
      }
      qs.iterator.zipWithIndex.map { case ((qid, _), qi) =>
        (qid, heaps(qi).toArray)
      }
    }

    // Pass 2: tiny keyed merge of partition winners into the global top-k.
    localTopK
      .aggregateByKey(Array.empty[Cand])(
        (acc, cands) => merge(acc, cands, kk),
        (a, b) => merge(a, b, kk))
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](
          LongType, LongType, DoubleType))
        it.flatMap { case (qid, cands) =>
          cands.sorted(worstFirst.reverse).iterator.map { case (sim, vecId) =>
            proj(new GenericInternalRow(Array[Any](qid, vecId, sim))).copy()
          }
        }
      }
  }

  private def merge(a: Array[Cand], b: Array[Cand], k: Int): Array[Cand] =
    (a ++ b).sorted(worstFirst.reverse).take(k)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): KnnJoinExec =
    copy(queries = newLeft, base = newRight)
}

/** DataFrame-level entry point for the custom operator. */
object KnnJoinApi {
  /** queriesDF: (qid BIGINT, qvec ARRAY<FLOAT>); baseDF: (vec_id BIGINT,
    * embedding ARRAY<FLOAT>). Returns unranked (qid, vec_id, sim).
    */
  def knnJoin(spark: SparkSession, queriesDF: DataFrame, baseDF: DataFrame,
              k: Int, excludeSelf: Boolean = true): DataFrame =
    GraftColumnBridge.ofRows(spark,
      KnnJoin(GraftColumnBridge.analyzed(queriesDF),
        GraftColumnBridge.analyzed(baseDF), k, excludeSelf))
}
