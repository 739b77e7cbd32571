package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Maximal-Marginal-Relevance greedy re-rank (Carbonell & Goldstein
  * 1998) of ONE query's candidate list, as a per-row kernel:
  * input `array<struct<id long, rel double, emb array<float>>>`, output
  * the `k` selected rows `array<struct<vec_id long, rank long,
  * mmr double>>` in selection order, where
  *
  *   `mmr(d) = λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`
  *
  * with `S` the already-selected set (empty max ≡ 0.0, so rank 1 is the
  * pure-relevance argmax scaled by λ) and ties broken by smaller id.
  * This is the diversity-aware selection step of retrieval/dedup
  * pipelines — "most relevant, least redundant" — and an operator Spark
  * has no declarative form of (the greedy recurrence is inherently
  * sequential in k).
  *
  * Float contract: pairwise `sim` is the engine's cosine op sequence
  * (strict left-fold dot and norms, exactly [[VecDot]]/`cosSql`)
  * quantized by the bit-stable `floor(x·1e6+0.5)/1e6` before use;
  * `rel` arrives pre-rounded; the argmax compares RAW mmr values and
  * the emitted mmr is quantized the same way — every arithmetic step
  * is the identical IEEE sequence in the DuckDB oracle's unrolled
  * restatement, so selection and scores are bit-reproducible.
  *
  * Scale shape: one kernel call per query row over a BOUNDED candidate
  * list (top-N from an index/brute retrieval), O(k·N) cosines each —
  * the per-query work is constant, parallelism is the query count, and
  * no shuffle happens beyond the collect_list that built the input.
  * A null candidate array yields null; candidates are expected non-null
  * structs (retrieval output).
  */
case class MmrRerank(child: Expression, lambda: Double, k: Int)
    extends UnaryExpression {

  require(lambda > 0.0 && lambda <= 1.0,
    s"lambda must be in (0, 1], got $lambda")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("rank", LongType, nullable = false),
    StructField("mmr", DoubleType, nullable = false))), containsNull = false)

  override def prettyName: String = "mmr_rerank"

  private def check(e: Expression): Unit = e.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, DoubleType, _, _),
      StructField(_, ArrayType(FloatType, _), _, _))), _) => ()
    case other => throw new IllegalArgumentException(
      "mmr_rerank requires array<struct<long, double, array<float>>> " +
        s"input, got $other")
  }

  /** Cosine with the engine's exact op sequence: left-fold dot and
    * norms from 0.0, `d / (sqrt(na) * sqrt(nb))`.
    */
  private def cos(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def q6(x: Double): Double =
    math.floor(x * 1e6 + 0.5) / 1e6

  /** The per-row kernel; public so generated code can call it. */
  def compute(input: ArrayData): GenericArrayData = {
    val n = input.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val embs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = input.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      embs(i) = row.getArray(2)
      i += 1
    }
    val taken = new Array[Boolean](n)
    // max q6(sim) to the selected set; -inf = "no selected member yet"
    // (only before the first selection — the empty-set max is DEFINED as
    // 0.0, but a real max may be negative and must not be clamped)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val oneMinus = 1.0 - lambda
    val m = math.min(k, n)
    val out = new Array[Any](m)
    var step = 0
    while (step < m) {
      var best = -1
      var bestScore = 0.0
      var c = 0
      while (c < n) {
        if (!taken(c)) {
          val ms =
            if (maxSim(c) == Double.NegativeInfinity) 0.0 else maxSim(c)
          val score = lambda * rels(c) - oneMinus * ms
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(c) < ids(best))) {
            best = c; bestScore = score
          }
        }
        c += 1
      }
      out(step) = new GenericInternalRow(
        Array[Any](ids(best), (step + 1).toLong, q6(bestScore)))
      taken(best) = true
      c = 0
      while (c < n) {
        if (!taken(c)) {
          val s = q6(cos(embs(c), embs(best)))
          if (s > maxSim(c)) maxSim(c) = s
        }
        c += 1
      }
      step += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("mmrRerank", this,
        classOf[MmrRerank].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MmrRerank =
    copy(child = newChild)
}

object MmrRerank {
  /** Column-API entry point; `cands` elements are (id, rel, emb). */
  def apply(cands: Column, lambda: Double, k: Int): Column =
    ColumnBridge.column(
      MmrRerank(ColumnBridge.expression(cands), lambda, k))
}
