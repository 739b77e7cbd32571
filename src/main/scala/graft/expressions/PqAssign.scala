package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization code assignment: split the embedding into
  * `M = codebook.length` contiguous subvectors and emit, per subspace,
  * the index of the L2-nearest codebook centroid — the vector's M-byte
  * PQ code (Jégou et al. 2011, "Product Quantization for Nearest
  * Neighbor Search").
  *
  * Distance per (subspace, cell) accumulates squared differences
  * strictly left-to-right in double from 0.0; the argmin breaks ties
  * toward the LOWER cell index — both pinned so an external oracle
  * restating the same folds reproduces codes bit-for-bit. The codebook
  * is a MODEL constant baked into the expression (like the LSH plane
  * matrix of [[PlaneSignature]]), so assignment is one narrow compiled
  * pass per row — no join, no shuffle, `O(M·K·subDim)` multiply-adds.
  * `array<float>` input widens exactly; a null array yields null.
  */
case class PqAssign(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have at least one subspace with at least one centroid")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "pq_assign"

  /** Element accessor dispatch; also the (fail-fast) input-type check. */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"pq_assign requires array<float> or array<double> input, got $other")
  }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData, floatIn: Boolean): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var s = 0
    var offset = 0
    while (s < m) {
      val cells = cb(s)
      val subDim = cells(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cells.length) {
        val cent = cells(c)
        var d = 0.0
        var j = 0
        while (j < subDim && offset + j < input.numElements()) {
          val x = if (floatIn) input.getFloat(offset + j).toDouble
                  else input.getDouble(offset + j)
          val diff = x - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      offset += subDim
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData], isFloat(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val floatIn = isFloat(child)
      val ref = ctx.addReferenceObj("pqAssign", this, classOf[PqAssign].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c, $floatIn);"
    })

  override protected def withNewChildInternal(newChild: Expression): PqAssign =
    copy(child = newChild)
}

object PqAssign {
  /** Column-API entry point. */
  def apply(emb: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAssign(ColumnBridge.expression(emb), codebook))
}
