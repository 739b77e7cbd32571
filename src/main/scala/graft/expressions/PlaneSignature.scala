package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd random-hyperplane LSH signature: for an embedding
  * vector and a fixed plane matrix, bit `p` is `1` iff
  * `dot(emb, planes(p)) > 0` — the signature kernel of the cosine-LSH
  * index family, with the plane matrix baked into the expression (it is
  * a deterministic model constant, generated driver-side).
  *
  * Why a custom `Expression`: the declarative form —
  * `transform(planeMatrix, p -> vec_dot(emb, p) > 0)` — rides
  * `ArrayTransform` (`CodegenFallback`): 128 interpreted lambda
  * dispatches per row plus a severed codegen span, the dominant cost of
  * the signature pass over an embedding corpus. This kernel runs the
  * full bits×dim double loop inside whole-stage codegen.
  *
  * Semantics are pinned to the formula of record (property-tested):
  * per-plane dot products accumulate strictly left-to-right in double
  * from 0.0 (identical FP ops to [[VecDot]], so identical signs),
  * clamped to the shorter of (dim, |emb|), and emit `1`/`0` ints like
  * the `when(..., 1).otherwise(0)` projection. `array<float>` input
  * widens exactly like `cast(float as double)`. A null array yields
  * null (null-safe contract); elements are expected non-null (the
  * embedding contract).
  */
case class PlaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.nonEmpty),
    "plane matrix must be non-empty")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "plane_signature"

  /** Element accessor dispatch; also the (fail-fast) input-type check,
    * deferred to bind/eval time.
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"plane_signature requires array<float> or array<double> input, got $other")
  }

  /** The matrix in primitive form (the Seq field keeps case-class
    * equality structural; this is what the loops read). */
  @transient private lazy val mat: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData, floatIn: Boolean): ArrayData = {
    val bits = mat.length
    val out = new Array[Int](bits)
    var p = 0
    while (p < bits) {
      val pl = mat(p)
      val n = math.min(pl.length, input.numElements())
      var s = 0.0
      var j = 0
      while (j < n) {
        val x = if (floatIn) input.getFloat(j).toDouble else input.getDouble(j)
        s += x * pl(j)
        j += 1
      }
      out(p) = if (s > 0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData], isFloat(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val floatIn = isFloat(child)
      val ref = ctx.addReferenceObj("planeSignature", this,
        classOf[PlaneSignature].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c, $floatIn);"
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneSignature =
    copy(child = newChild)
}

object PlaneSignature {
  /** Column-API entry point. */
  def apply(emb: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(
      PlaneSignature(ColumnBridge.expression(emb), planes))
}
