package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion across retrieval systems — the standard way to combine
  * heterogeneous indexes (LSH + IVF, lexical BM25 + embedding ANN)
  * without calibrating their incomparable scores.
  */
object Fusion {

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * each input ranking contributes `1 / (rrfK + rank)` for every
    * (query, item) it returns, items absent from a ranking contribute 0
    * from it, and the fused top `k` per query wins. RRF needs no score
    * calibration — only ranks — which is why it beats learned fusion
    * baselines across engine pairs in the paper; `rrfK = 60` is the
    * paper's constant.
    *
    * Inputs are result frames `(qidCol, idCol, scoreCol)`; each frame's
    * rank is derived by its own `(score DESC, id)` window — every
    * in-repo retrieval op emits its score ROUNDED, so that ordering is
    * engine-stable. Addends combine left-to-right over the input order
    * (a fixed association, not a data-order fold) and the fused score
    * carries the registry-wide `round(_, 6)` BEFORE the final ranking;
    * ties break by id.
    *
    * Scale shape: result frames are top-k-per-query by construction —
    * eval-set-sized, never corpus-sized — so the full outer joins and
    * windows here move `O(queries × k × systems)` rows; the corpus-side
    * cost lives entirely in the input retrievals.
    */
  def rrf(rankings: Seq[DataFrame], qidCol: String, idCol: String,
          scoreCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k > 0, s"k must be positive, got $k")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(qidCol), col(idCol),
        (lit(1.0) / (lit(rrfK.toDouble) + row_number().over(w)))
          .as(s"__graft_rrf_$i"))
    }
    val joined = contribs.reduce((a, b) => a.join(b, Seq(qidCol, idCol), "full"))
    val fused = contribs.indices
      .map(i => coalesce(col(s"__graft_rrf_$i"), lit(0.0)))
      .reduce(_ + _)
    val rw = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf").desc, col(idCol))
    joined
      .select(col(qidCol), col(idCol), round(fused, 6).as("rrf"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rank"), col("rrf"))
  }
}
