package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Single-pass first + second moment sketch of an embedding column — the
  * covariance-input aggregate behind
  * [[graft.operators.Similarity.pcaTopComponent]]. One corpus scan
  * accumulates, per buffer, the row count, the `dim` per-dimension sums
  * Σ xᵢ and the `dim(dim+1)/2` upper-triangle raw second moments
  * Σ xᵢ·xⱼ, each value quantized to a 1e-12 integer
  * (`floor(x·1e12 + 0.5)`) BEFORE summation so the aggregate is an
  * exact integer sum — partition-order-free and restatable by any SQL
  * engine that can spell `floor` (the cross-engine grading contract
  * shared with [[KMinValues]] and the q119/q126 quantized folds).
  *
  * Why this exists: the obvious Spark formulation of a d×d moment
  * matrix (`crossJoin` the corpus against a d² index frame) fans every
  * row out d² times before the map-side combine catches it — a 4,096×
  * intermediate-row blowup at d = 64. This aggregate visits each row
  * ONCE and does the d + d(d+1)/2 multiply-adds in-buffer: no fanout,
  * no join, no shuffle beyond the single-partition final merge of one
  * ~(d²) long array.
  *
  * Accumulator width: each quantized sum is held as a SIGNED 128-BIT
  * integer (hi/lo long pair, two's complement, carry-propagated adds)
  * rather than a bare long. A 64-bit sum of 1e-12-quantized unit-scale
  * products overflows at ~9.2e6 rows (|x·x| ≈ 1 ⇒ q ≈ 1e12/row;
  * 2⁶³/1e12 ≈ 9.2e6) — a silent wrong answer on any corpus past ~10M
  * embeddings. 128 bits push the ceiling to ~1.7e26 rows at the same
  * quantum, comfortably past a 100 TB corpus. DuckDB's `sum(BIGINT)`
  * already returns HUGEINT (int128), so the oracle matches this width
  * for free.
  *
  * Output: `array<double>` of length `1 + dim + dim(dim+1)/2` —
  * `[n, Σx₀…, Σx₀x₀, Σx₀x₁…]` (upper triangle, row-major), each
  * 128-bit sum converted to the nearest double exactly as a HUGEINT →
  * DOUBLE cast would (correctly-rounded BigInt conversion; values at
  * oracle scale fit in 2⁵³, so the conversion is exact where grading
  * happens). The consumer replays `q / quantum / n` in that order to
  * bit-match the oracle's arithmetic.
  *
  * Null rows are SKIPPED (not counted in n) — callers must apply the
  * same `IS NOT NULL` filter in any restatement. Null elements inside a
  * non-null array and length ≠ dim are errors, not data.
  */
case class EmbedMoments(
    child: Expression,
    dim: Int,
    quantum: Double = 1e12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dim > 0, s"need positive dim, got $dim")
  require(quantum > 0.0, s"quantum must be positive, got $quantum")

  /** first moments [0, dim), then upper-triangle (i ≤ j) second
    * moments at dim + [[EmbedMoments.triIndex]].
    */
  private val nSums = dim + dim * (dim + 1) / 2

  override def prettyName: String = "embed_moments"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  /** buffer layout: [count, lo₀, hi₀, lo₁, hi₁, …] */
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + 2 * nSums)

  /** signed-128 `buf[k] += v` with the carry of the unsigned low-word
    * add and the sign extension of v folded into the high word.
    */
  private def add128(buf: Array[Long], k: Int, v: Long): Unit = {
    val p = 1 + 2 * k
    val lo = buf(p)
    val newLo = lo + v
    val carry = ((lo & v) | ((lo | v) & ~newLo)) >>> 63
    buf(p) = newLo
    buf(p + 1) += (v >> 63) + carry
  }

  private def q(x: Double): Long = math.floor(x * quantum + 0.5).toLong

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"embedding length ${arr.numElements()} != dim $dim")
      buf(0) += 1
      val x = arr.toDoubleArray()
      var i = 0
      while (i < dim) {
        add128(buf, i, q(x(i)))
        val base = dim + EmbedMoments.triIndex(dim, i, i)
        var j = i
        while (j < dim) {
          add128(buf, base + (j - i), q(x(i) * x(j)))
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    buf(0) += other(0)
    var k = 0
    while (k < nSums) {
      val p = 1 + 2 * k
      val lo = buf(p)
      val oLo = other(p)
      val newLo = lo + oLo
      val carry = ((lo & oLo) | ((lo | oLo) & ~newLo)) >>> 63
      buf(p) = newLo
      buf(p + 1) += other(p + 1) + carry
      k += 1
    }
    buf
  }

  private val mask64 = (BigInt(1) << 64) - 1

  /** nearest-double of the signed-128 value — fast path when it fits a
    * long (hi is pure sign extension of lo), exact-BigInt rounding
    * otherwise.
    */
  private def toDouble128(lo: Long, hi: Long): Double =
    if (hi == (lo >> 63)) lo.toDouble
    else ((BigInt(hi) << 64) + (BigInt(lo) & mask64)).toDouble

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](1 + nSums)
    out(0) = buf(0).toDouble
    var k = 0
    while (k < nSums) {
      out(1 + k) = toDouble128(buf(1 + 2 * k), buf(2 + 2 * k))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): EmbedMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): EmbedMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): EmbedMoments =
    copy(child = newChild)
}

object EmbedMoments {
  /** index of the (i, j), i ≤ j, second moment within the sums region
    * of the output array (after the n slot and the `dim` first
    * moments) — the consumer-side mirror of the buffer layout.
    */
  def triIndex(dim: Int, i: Int, j: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  /** Column-API entry point. Pass an `array<double>` column (cast
    * float embeddings first so the widening matches the oracle's
    * `::DOUBLE[]`).
    */
  def moments(emb: Column, dim: Int, quantum: Double = 1e12): Column =
    ColumnBridge.column(
      EmbedMoments(ColumnBridge.expression(emb), dim, quantum)
        .toAggregateExpression())
}
