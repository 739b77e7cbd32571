package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout primitives — the write-side ordering that buys
  * read-side data skipping at 100 TB.
  */
object Layout {

  /** Morton / Z-order value over up to 4 numeric columns: each column is
    * min-max quantized to `bits` bits (one bounded stats aggregate,
    * broadcast) and the quantized values' bits are interleaved —
    * bit `b` of column `j` lands at position `b·ncols + j` — so sorting
    * by the single `zCol` clusters rows that are close in EVERY keyed
    * dimension. Writing `repartitionByRange($zCol).sortWithinPartitions
    * ($zCol)` (compose with [[graft.sources.TableSink]]'s sorted layout)
    * gives each file a tight min/max envelope on ALL the keyed columns
    * at once, where a lexicographic sort only prunes on its leading
    * column — the classic multi-dimensional clustering trade
    * (Morton 1966; the layout behind `OPTIMIZE ZORDER BY`).
    *
    * Everything here is one narrow codegen'd projection (static bit
    * unroll — no HOF, no UDF) over a broadcast 1-row stats frame; the
    * z-value is a pure function of the row and the corpus min/max.
    * Quantization runs in doubles with one multiply and one divide in
    * fixed association, so the value is reproducible cross-engine; a
    * constant column quantizes to 0 (no information, no bits), and a
    * null in any keyed column yields a null z-value (callers decide
    * where unkeyed rows sort).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
                 zCol: String = "z_value"): DataFrame = {
    require(cols.nonEmpty && cols.size <= 4,
      s"z-order needs 1..4 columns, got ${cols.size}")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits x cols must fit a long, got $bits x ${cols.size}")
    require(!df.columns.contains(zCol),
      s"input already has a '$zCol' column")
    val statCols = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__graft_mn_$c"),
      max(col(c)).cast("double").as(s"__graft_mx_$c")))
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val m = (1L << bits) - 1
    val z = cols.zipWithIndex.map { case (c, j) =>
      val mn = col(s"__graft_mn_$c")
      val mx = col(s"__graft_mx_$c")
      // null test first: the degenerate (mx == mn) branch would otherwise
      // quantize a NULL key to 0 instead of nulling the z-value
      val q = when(col(c).isNull, lit(null).cast("long"))
        .otherwise(when(mx === mn, lit(0L)).otherwise(
          floor((col(c).cast("double") - mn) * lit(m.toDouble) / (mx - mn))
            .cast("long")))
      (0 until bits).map(b =>
        shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * cols.size + j))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
    df.crossJoin(broadcast(stats))
      .withColumn(zCol, z)
      .drop(cols.flatMap(c => Seq(s"__graft_mn_$c", s"__graft_mx_$c")): _*)
  }
}
