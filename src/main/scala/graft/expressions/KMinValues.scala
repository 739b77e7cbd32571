package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — a DETERMINISTIC approximate COUNT(DISTINCT) whose estimate
  * is a pure function of the input hash set, so the same data always
  * yields the same answer on any cluster layout (unlike sampling) and the
  * answer is restatable in any other SQL engine (unlike HLL++, whose
  * register layout is implementation-private — that is why this sketch is
  * oracle-gradable and `approx_count_distinct` is not).
  *
  * State is the k smallest DISTINCT hash values seen (a bounded TreeSet:
  * insert, then trim the max), merged across partials by set-union +
  * trim — associative and commutative, so map-side partial aggregation
  * applies and the shuffle carries at most k longs per group instead of
  * the full value set. That bounded state is the entire point: exact
  * distinct costs a shuffle of every distinct value; this costs k·8
  * bytes per group regardless of cardinality.
  *
  * Estimator (Bar-Yossef et al., RANDOM'02): with hashes uniform on
  * [0, `domain`), the kth smallest value h_k estimates distinct count as
  * (k-1) · domain / h_k; below k distinct values the set is exhaustive
  * and the exact size is returned. Relative error ~ 1/sqrt(k-2).
  *
  * The hash is the CALLER's job (pass an already-hashed long column):
  * keeping the sketch hash-agnostic is what lets a portable (md5-derived)
  * hash make the estimate engine-independent, while a faster xxhash64
  * serves when cross-engine grading is not needed.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    domain: Long = 1L << 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")
  require(domain > 0, s"hash domain must be positive, got $domain")

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  // analysis-time check: a non-bigint child would otherwise pass
  // resolution and throw ClassCastException mid-job in update().
  // (Covariant Seq[DataType] — AbstractDataType is private[sql].)
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(b: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    b.add(v)
    if (b.size > k) b.pollLast()
  }

  override def update(b: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }

  override def merge(b: java.util.TreeSet[java.lang.Long],
                     o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next())
    b
  }

  /** (k-1)·domain/h_k, or the exact size while the set is exhaustive.
    * The arithmetic shape ((k-1)·domain first, then one divide) is part
    * of the cross-engine contract — an oracle must restate it in the
    * same order to bit-match the double.
    */
  override def eval(b: java.util.TreeSet[java.lang.Long]): Any =
    if (b.size < k) b.size.toDouble
    else ((k - 1).toDouble * domain.toDouble) / b.last().toDouble

  override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.size * 8)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val b = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) b.add(bb.getLong())
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  /** Column-API entry point: KMV distinct estimate of an already-hashed
    * long column with hashes uniform on [0, domain).
    */
  def kmvDistinct(hashed: Column, k: Int, domain: Long = 1L << 60): Column =
    ColumnBridge.column(
      KMinValues(ColumnBridge.expression(hashed), k, domain).toAggregateExpression())
}
