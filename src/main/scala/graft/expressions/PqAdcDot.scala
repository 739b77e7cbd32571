package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Asymmetric-distance (ADC) inner product of a QUERY vector against a
  * PQ-CODED corpus vector: `Σ_m dot(q_m, codebook[m][code_m])` — the
  * query stays exact, the corpus side is represented by its per-subspace
  * centroid (Jégou et al. 2011 §III; the inner-product form used for
  * cosine/MIPS retrieval). With the codebook baked in as a model
  * constant, scoring a candidate costs `O(dim)` multiply-adds on
  * M + dim cached values instead of touching the full corpus vector —
  * the reason a PQ index scans 4–16× less data than exact re-ranking.
  *
  * Float discipline, pinned for the oracle: each subspace's partial dot
  * accumulates left-to-right in double from 0.0, and the M partials are
  * added in subspace order from 0.0 — restatable as per-subspace
  * `list_reduce` folds added in `m` order. `array<float>` queries widen
  * exactly. Null query or code array yields null (null-safe contract).
  */
case class PqAdcDot(left: Expression, right: Expression,
                    codebook: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have at least one subspace with at least one centroid")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc_dot"

  /** Query accessor dispatch; also the (fail-fast) input-type check. */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_adc_dot query requires array<float> or array<double>, got $other")
  }

  private def checkCodes(e: Expression): Unit = e.dataType match {
    case ArrayType(IntegerType, _) => ()
    case other => throw new IllegalArgumentException(
      s"pq_adc_dot codes require array<int>, got $other")
  }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  /** The per-row kernel; public so generated code can call it. */
  def compute(q: ArrayData, codes: ArrayData, floatIn: Boolean): Double = {
    val m = math.min(cb.length, codes.numElements())
    var total = 0.0
    var s = 0
    var offset = 0
    while (s < m) {
      val cent = cb(s)(codes.getInt(s))
      var ip = 0.0
      var j = 0
      while (j < cent.length && offset + j < q.numElements()) {
        val x = if (floatIn) q.getFloat(offset + j).toDouble
                else q.getDouble(offset + j)
        ip += x * cent(j)
        j += 1
      }
      total += ip
      offset += cent.length
      s += 1
    }
    total
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    checkCodes(right)
    compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], isFloat(left))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val floatIn = isFloat(left)
      checkCodes(right)
      val ref = ctx.addReferenceObj("pqAdcDot", this, classOf[PqAdcDot].getName)
      s"${ev.value} = $ref.compute($l, $r, $floatIn);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqAdcDot {
  /** Column-API entry point: `(query embedding, corpus PQ codes)`. */
  def apply(query: Column, codes: Column,
            codebook: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAdcDot(
      ColumnBridge.expression(query), ColumnBridge.expression(codes), codebook))
}
