package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature of a shingle array: element `i` is
  * `min over shingles of xxhash64(shingle, i)` — numerically identical
  * to both the 64-min-aggregate formulation and the declarative HOF
  * fold (same per-shingle hashes — Spark's `xxhash64(g, i)` chains
  * `hashInt(i, hashUnsafeBytes(g, 42))` — same elementwise min; pinned
  * by test), computed in ONE narrow compiled pass per document with a
  * single `numHashes`-long buffer.
  *
  * Why a custom `Expression`: the aggregate path evaluates 64 separate
  * seeded hash expressions per EXPLODED shingle row (×10⁸ expression
  * dispatches at sf0.1, each re-hashing the shingle bytes), and the HOF
  * fold builds a 64-element array per shingle on the interpreted lambda
  * path. This kernel hashes each shingle's BYTES once and derives the
  * 64 seeded variants with `hashInt` finalizers — `O(shingles)` byte
  * hashes + `O(shingles · numHashes)` integer mixes, zero per-shingle
  * allocation — and removes the explode + keyed aggregate from the
  * signature stage entirely: banding runs directly on the shingle
  * frame. An empty shingle array yields the empty-fold signature (all
  * `Long.MaxValue`), matching the HOF formulation; a null array yields
  * null (null-safe contract).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StringType, _) => ()
    case other => throw new IllegalArgumentException(
      s"minhash_sig requires array<string> input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = input.getUTF8String(i)
      // xxhash64(g, k) == hashInt(k, hashUnsafeBytes(g, 42)): hash the
      // bytes once, then one integer finalizer per signature position
      val base =
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var k = 0
      while (k < numHashes) {
        val h = XXH64.hashInt(k, base)
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point. */
  def apply(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
