package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pack a payload (the UTF-8 bytes of a string column) into a REAL
  * JPEG/JFIF container per the public JPEG (ITU-T T.81) and JFIF specs:
  * SOI, APP0/JFIF, a COM segment whose length VARIES with the payload
  * (so the SOF0 frame header lands at a different offset per row and a
  * decoder must genuinely walk the marker stream — fixed-offset peeking
  * cannot pass), a baseline-DCT SOF0 frame header (8-bit precision,
  * fixed width [[JfifImage.Width]] px, `height = max(⌈bytes/width⌉, 1)`,
  * 3 components), an SOS header, the payload bytes as the entropy-coded
  * stream (any 0xFF byte is 0x00-stuffed per spec), and EOI.
  *
  * This is the synthesis side of the JPEG test surface — the format real
  * crawls are overwhelmingly made of. Like [[BmpImage]], every header
  * field is a pure function of the payload byte length, so an external
  * oracle can restate the decoded features ([[ImageFeatures]]'s marker
  * walk to SOF) from the source text alone. The entropy stream holds raw
  * payload bytes, not Huffman-coded DCT coefficients — pixel DECODING
  * stays behind the documented codec seam (`byte_mean` is null for
  * entropy-coded formats); the container structure is spec-true.
  *
  * A null input yields null (null-safe contract).
  */
case class JfifImage(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def prettyName: String = "jfif_image"

  /** Input-type check, deferred to bind/eval time. */
  private def check(e: Expression): Unit = e.dataType match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"jfif_image requires string input, got $other")
  }

  /** The per-row kernel; public so generated code can call it. */
  def compute(text: UTF8String): Array[Byte] = {
    val data = text.getBytes
    val n = data.length
    val height = math.max((n + JfifImage.Width - 1) / JfifImage.Width, 1)
    // COM payload: the first (n mod 13) bytes of the text — deterministic,
    // varies 0..12 across rows, shifts every later marker's offset
    val comLen = n % 13
    var stuffed = 0
    var i = 0
    while (i < n) { if ((data(i) & 0xff) == 0xff) stuffed += 1; i += 1 }
    val out = new Array[Byte](
      2 + 18 + (4 + comLen) + 19 + 14 + n + stuffed + 2)
    var o = 0
    def b(v: Int): Unit = { out(o) = (v & 0xff).toByte; o += 1 }
    def be16(v: Int): Unit = { b(v >>> 8); b(v) }
    b(0xff); b(0xd8)                                  // SOI
    b(0xff); b(0xe0); be16(16)                        // APP0, len 16
    b('J'); b('F'); b('I'); b('F'); b(0)              // identifier
    b(1); b(1)                                        // version 1.1
    b(0); be16(1); be16(1)                            // aspect-ratio units
    b(0); b(0)                                        // no thumbnail
    b(0xff); b(0xfe); be16(2 + comLen)                // COM, variable len
    System.arraycopy(data, 0, out, o, comLen); o += comLen
    b(0xff); b(0xc0); be16(17)                        // SOF0, len 17
    b(8)                                              // precision
    be16(height); be16(JfifImage.Width)               // dimensions
    b(3)                                              // 3 components
    b(1); b(0x22); b(0)                               // Y, 2x2 sampling
    b(2); b(0x11); b(1)                               // Cb
    b(3); b(0x11); b(1)                               // Cr
    b(0xff); b(0xda); be16(12)                        // SOS, len 12
    b(3); b(1); b(0); b(2); b(0x11); b(3); b(0x11)    // component tables
    b(0); b(0x3f); b(0)                               // spectral selection
    i = 0
    while (i < n) {                                   // entropy stream,
      val v = data(i) & 0xff                          // FF -> FF 00 stuffed
      b(v); if (v == 0xff) b(0)
      i += 1
    }
    b(0xff); b(0xd9)                                  // EOI
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    check(child)
    compute(input.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      check(child)
      val ref = ctx.addReferenceObj("jfifImage", this, classOf[JfifImage].getName)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): JfifImage =
    copy(child = newChild)
}

object JfifImage {
  /** Fixed frame width in pixels; height = max(⌈payload bytes/Width⌉, 1)
    * so the nominal pixel count tracks the payload size. */
  val Width = 16

  /** Column-API entry point. */
  def apply(text: Column): Column =
    ColumnBridge.column(JfifImage(ColumnBridge.expression(text)))
}
