package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Audio-style frame statistics over a binary payload treated as 8-bit
  * PCM samples — the feature-extraction stage of an audio pipeline,
  * with every statistic INTEGER-exact so the output is restatable
  * bit-for-bit in any engine (the multimodal grading convention):
  *
  *  - `n_samples` — frame length in bytes;
  *  - `sum_amp`   — Σ bᵢ (first moment; mean = sum/n, left undivided);
  *  - `energy`    — Σ bᵢ² (raw second moment, the loudness proxy);
  *  - `mean_crossings` — how often consecutive samples cross the frame
  *    mean, tested by the integer cross-product `bᵢ·n > Σb` (no
  *    division): the zero-crossing-rate analogue for unsigned samples,
  *    the classic cheap voiced/unvoiced discriminator.
  *
  * One compiled pass per frame behind a codegen reference call — the
  * same narrow, partition-preserving shape as [[ImageFeatures]]; a
  * real decoder (MP3/FLAC frames) would slot behind the same seam with
  * the plumbing unchanged. An empty frame yields all-zero stats; a
  * null payload yields null (null-safe contract).
  */
case class PcmFrameStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_amp", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("mean_crossings", LongType, nullable = false)))

  override def prettyName: String = "pcm_frame_stats"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case BinaryType => ()
    case other => throw new IllegalArgumentException(
      s"pcm_frame_stats requires binary input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(b: Array[Byte]): GenericInternalRow = {
    val n = b.length
    var s = 0L
    var e = 0L
    var i = 0
    while (i < n) {
      val v = (b(i) & 0xff).toLong
      s += v
      e += v * v
      i += 1
    }
    var crossings = 0L
    i = 1
    while (i < n) {
      val above = (b(i) & 0xff).toLong * n > s
      val prevAbove = (b(i - 1) & 0xff).toLong * n > s
      if (above != prevAbove) crossings += 1L
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, s, e, crossings))
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("pcmFrameStats", this,
        classOf[PcmFrameStats].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): PcmFrameStats =
    copy(child = newChild)
}

object PcmFrameStats {
  /** Column-API entry point. */
  def apply(frame: Column): Column =
    ColumnBridge.column(PcmFrameStats(ColumnBridge.expression(frame)))
}
