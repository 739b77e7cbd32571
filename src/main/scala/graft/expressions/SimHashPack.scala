package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash bit-sign aggregation as ONE native Catalyst aggregate: per
  * group, accumulate the ±1 sum for each of the low `bits` bits of the
  * input token hashes, then pack the sign bits
  * (`sig |= (sum_i > 0) << i`) into a single long at eval.
  *
  * Why an aggregate expression instead of `bits` SQL `sum(when(...))`
  * columns (the previous formulation): the unrolled form is a ~10·bits-
  * node expression tree that Catalyst re-optimizes on EVERY execution —
  * measured ~1.4 s of driver time per run for bits = 60, independent of
  * data size (see BASELINE.md round-11 notes; same lesson as the
  * multi-probe probe-set and debias projections). This kernel is one
  * plan node: fixed `bits`-long buffer, associative-commutative merge, so
  * map-side partial aggregation still combines before the group shuffle —
  * the property the 60-column formulation existed to keep.
  *
  * Tie semantics match the SQL formulation and the DuckDB oracle exactly:
  * a bit sum of 0 (or an empty group) packs to 0 — strictly-positive sums
  * set bits.
  */
case class SimHashPack(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def prettyName: String = "simhash_pack"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        b(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (b(i) > 0L) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 8)
    var i = 0
    while (i < bits) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    var i = 0
    while (i < bits) { b(i) = bb.getLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashPack =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashPack =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashPack =
    copy(child = newChild)
}

object SimHashPack {
  /** Column-API entry point: packed SimHash signature of an
    * already-hashed long token column over the low `bits` bits.
    */
  def simHashSig(hashed: Column, bits: Int): Column =
    ColumnBridge.column(
      SimHashPack(ColumnBridge.expression(hashed), bits).toAggregateExpression())
}
