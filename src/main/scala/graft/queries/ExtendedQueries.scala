package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.KMinValues
import graft.functions.TfIdf
import graft.operators.{AsOf, Quantiles, RangeJoin, Sessionize, Sketch, Splits, TimeSeries}
import graft.sources.Tables
import QueryDefs._

/** Q38–Q55 (+ Q100 count-min, Q105 z-order) — extension surface: the
  * relational operators Spark
  * has no built-in form of (as-of join, interval join), plus the
  * pipeline primitives a 100 TB training-data curation run leans on
  * (deterministic distinct-count and frequency sketches — KMV q40,
  * count-min q100 — permanent dataset splits, TF-IDF keywording,
  * per-group quantiles).
  *
  * Same oracle discipline as the rest of the registry: every query is
  * graded by a full-algorithm DuckDB restatement (the as-of and KMV
  * algorithms are deliberately built from engine-portable pieces —
  * union+window, md5-derived hashes — so the oracle can reproduce them
  * bit-for-bit). Doubles carry the registry-wide accepted rounding risk
  * (see PipelineQueries scaladoc).
  */
object ExtendedQueries {

  // ------------------------------------------------------------ as-of join

  /** Q38 — last-click attribution: each purchase event joined (as-of) to
    * the same user's latest click at-or-before the purchase. Sort-merge
    * as-of (one shuffle on user_id) — see [[AsOf.join]]; -1 sentinels
    * instead of nulls keep the graded columns hash-stable across
    * engines.
    */
  private def q38(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    AsOf.join(purchases, clicks, Seq("user_id"), "ts", "click_ts", "click_id")
      .select(
        col("event_id"), col("user_id"), tsUs(col("ts")).as("ts_us"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"),
        coalesce(tsUs(col("click_ts")), lit(-1L)).as("click_ts_us"),
        coalesce(tsUs(col("ts")) - tsUs(col("click_ts")), lit(-1L)).as("gap_us"))
      .orderBy("event_id")
  }

  /** The oracle restates the same union+window algorithm (DuckDB's ASOF
    * JOIN leaves equal-timestamp tie-breaks unspecified; this pins
    * them identically to [[AsOf.join]]).
    */
  private val q38Sql =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
      |      WHERE event_type = 'purchase'),
      |u AS (
      |  SELECT user_id, us, 0 AS side, event_id AS tie,
      |         event_id AS c_id, us AS c_us, NULL::BIGINT AS p_id FROM c
      |  UNION ALL
      |  SELECT user_id, us, 1, 0, NULL, NULL, event_id FROM p),
      |m AS (SELECT user_id, us, side, p_id,
      |        last_value(c_id IGNORE NULLS) OVER w AS click_id,
      |        last_value(c_us IGNORE NULLS) OVER w AS click_us
      |      FROM u WINDOW w AS (PARTITION BY user_id ORDER BY us, side, tie
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT p_id AS event_id, user_id, us AS ts_us,
      |       coalesce(click_id, -1)::BIGINT AS click_id,
      |       coalesce(click_us, -1)::BIGINT AS click_ts_us,
      |       coalesce(us - click_us, -1)::BIGINT AS gap_us
      |FROM m WHERE side = 1 ORDER BY event_id""".stripMargin

  // ------------------------------------------------------- interval join

  private val OverlapGapUs = 3600000000L // 1 h session gap
  private val OverlapBinUs = 3600000000L // 1 h bins ≈ session length scale

  /** Q39 — session concurrency: per user session (1 h inactivity gap),
    * how many OTHER users' sessions overlap it in time. The overlap join
    * runs through [[RangeJoin.intervalJoin]]'s bin bucketing (time bins
    * are the shuffle key — no nested loop).
    *
    * Self-matches do the zero-handling: every session overlaps itself
    * exactly once, and one user's sessions are time-DISJOINT by
    * construction (a session ends > gap before the next starts), so
    * keeping all matches and emitting count−1 equals the cross-user
    * overlap count while guaranteeing every session a row — no third
    * consumer of the session frame for zero-fill, and no filter in the
    * join.
    */
  private def q39(spark: SparkSession, dir: String): DataFrame = {
    val iv = Sessionize.assign(Tables.events(spark, dir),
        "user_id", "ts", "event_id", gapUs = OverlapGapUs)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(unix_micros(col("ts"))).as("lo_us"),
           max(unix_micros(col("ts"))).as("hi_us"))
      .repartition(col("user_id"), col("session_id"))
    val a = iv.select(col("user_id").as("a_user"), col("session_id").as("a_sid"),
      col("lo_us").as("a_lo"), col("hi_us").as("a_hi"))
    val b = iv.select(col("user_id").as("b_user"), col("session_id").as("b_sid"),
      col("lo_us").as("b_lo"), col("hi_us").as("b_hi"))
    RangeJoin.intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        binWidth = OverlapBinUs)
      .groupBy(col("a_user"), col("a_sid"))
      .agg((count(lit(1)) - 1).as("n_overlaps"))
      .select(col("a_user").as("user_id"), col("a_sid").as("session_id"),
        col("n_overlaps"))
      .orderBy("user_id", "session_id")
  }

  private val q39Sql =
    s"""WITH x AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us,
       |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > $OverlapGapUs
       |              THEN 1 ELSE 0 END AS ns
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (SELECT user_id, us,
       |        (sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS sid
       |      FROM x),
       |iv AS (SELECT user_id, sid, min(us) AS lo, max(us) AS hi
       |       FROM s GROUP BY 1, 2)
       |SELECT a.user_id, a.sid AS session_id, count(b.user_id)::BIGINT AS n_overlaps
       |FROM iv a LEFT JOIN iv b
       |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.user_id != b.user_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------ kmv sketch

  private val KmvK = 64

  /** Q40 — per-event-type distinct users via the KMV sketch (k = 64):
    * bounded state per group regardless of cardinality — the scale
    * route to COUNT(DISTINCT) — with a portable md5-derived hash so the
    * estimate itself (not just the mechanism) is graded cross-engine.
    */
  private def q40(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(KMinValues.kmvDistinct(
          Splits.portableHash(col("user_id"), "kmv"), KmvK), 6).as("kmv_distinct"))
      .orderBy("event_type")

  /** Full estimator restatement: kth-smallest distinct hash per group,
    * (k−1)·2^60/h_k above k distinct, exact size below. The double
    * arithmetic mirrors [[KMinValues.eval]]'s operation order.
    */
  private val q40Sql =
    s"""WITH h AS (SELECT DISTINCT event_type,
       |             ('0x' || substr(md5('kmv:' || user_id::VARCHAR), 1, 15))::BIGINT AS hv
       |           FROM events),
       |r AS (SELECT event_type, hv,
       |             row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
       |      FROM h),
       |k AS (SELECT event_type, max(rn) AS nd,
       |             max(CASE WHEN rn = $KmvK THEN hv END) AS hk
       |      FROM r GROUP BY 1),
       |c AS (SELECT event_type, count(*) AS n_events FROM events GROUP BY 1)
       |SELECT c.event_type, c.n_events,
       |       round(CASE WHEN k.nd >= $KmvK
       |                  THEN (${KmvK - 1}.0 * 1152921504606846976.0) / k.hk
       |                  ELSE k.nd::DOUBLE END, 6) AS kmv_distinct
       |FROM c JOIN k USING (event_type) ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ cms sketch

  private val CmsDepth = 4
  private val CmsWidth = 2048
  private val CmsTopK = 20

  /** Q100 — count-min frequency estimates: the corpus term stream is
    * compressed into a bounded 4×2048 cell sketch and the exact top-20
    * terms read their estimates back out of it (see
    * [[graft.operators.Sketch]]) — grading both CMS linear build and
    * min-read estimator, and exhibiting the `estimate ≥ exact` one-sided
    * error live (equality on a corpus this small).
    */
  private def q100(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
    val top = toks.groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("term")).limit(CmsTopK)
    Sketch.cmsEstimate(Sketch.countMin(toks, "term", CmsDepth, CmsWidth),
        top, "term", CmsDepth, CmsWidth)
      .join(top, "term")
      .select(col("term"), col("n_exact"), col("cms_est"))
      .orderBy(col("n_exact").desc, col("term"))
  }

  private val q100Sql =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
       |             FROM documents WHERE text IS NOT NULL),
       |cells AS (SELECT i, ('0x' || substr(md5('cms' || i::VARCHAR || ':'
       |                       || term), 1, 15))::BIGINT % $CmsWidth AS b
       |          FROM tok CROSS JOIN range(0, $CmsDepth) t(i)),
       |sk AS (SELECT i, b, count(*)::BIGINT AS c FROM cells GROUP BY 1, 2),
       |top AS (SELECT term, count(*)::BIGINT AS n_exact FROM tok GROUP BY 1
       |        ORDER BY n_exact DESC, term LIMIT $CmsTopK),
       |est AS (SELECT t.term, min(coalesce(sk.c, 0))::BIGINT AS cms_est
       |        FROM top t CROSS JOIN range(0, $CmsDepth) r(i)
       |        LEFT JOIN sk ON sk.i = r.i
       |                    AND sk.b = ('0x' || substr(md5('cms'
       |                          || r.i::VARCHAR || ':' || t.term), 1, 15))
       |                          ::BIGINT % $CmsWidth
       |        GROUP BY 1)
       |SELECT term, n_exact, cms_est FROM top JOIN est USING (term)
       |ORDER BY n_exact DESC, term""".stripMargin

  /** q118 heavy-hitter threshold: terms at ≥ 0.5% of the token stream. */
  private val HhPhi = 0.005

  /** Q118 — CMS φ-heavy hitters: every term whose sketch estimate
    * reaches ⌈$HhPhi·N⌉ (see [[graft.operators.Sketch.heavyHitters]]) —
    * the monitoring read a shipped sketch exists for, graded with the
    * exact count and collision inflation as audit columns (the report
    * is one-sided: true heavy hitters can't be missed, light terms can
    * only enter by collision).
    */
  private def q118(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    val toks = Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(TextFns.tokens(col("text"))).as("term"))
    Sketch.heavyHitters(toks, "term", HhPhi, CmsDepth, CmsWidth)
      .orderBy(col("cms_est").desc, col("term"))
  }

  private val q118Sql =
    s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
       |             FROM documents WHERE text IS NOT NULL),
       |cells AS (SELECT i, ('0x' || substr(md5('cms' || i::VARCHAR || ':'
       |                       || term), 1, 15))::BIGINT % $CmsWidth AS b
       |          FROM tok CROSS JOIN range(0, $CmsDepth) t(i)),
       |sk AS (SELECT i, b, count(*)::BIGINT AS c FROM cells GROUP BY 1, 2),
       |ex AS MATERIALIZED (SELECT term, count(*)::BIGINT AS n_exact
       |                    FROM tok GROUP BY 1),
       |tot AS (SELECT sum(n_exact)::BIGINT AS n_total FROM ex),
       |est AS (SELECT e.term, min(coalesce(sk.c, 0))::BIGINT AS cms_est
       |        FROM ex e CROSS JOIN range(0, $CmsDepth) r(i)
       |        LEFT JOIN sk ON sk.i = r.i
       |                    AND sk.b = ('0x' || substr(md5('cms'
       |                          || r.i::VARCHAR || ':' || e.term), 1, 15))
       |                          ::BIGINT % $CmsWidth
       |        GROUP BY 1)
       |SELECT ex.term, est.cms_est, ex.n_exact,
       |       (est.cms_est - ex.n_exact)::BIGINT AS inflation
       |FROM est JOIN ex USING (term), tot
       |WHERE est.cms_est >= ceil($HhPhi * tot.n_total)
       |ORDER BY cms_est DESC, term""".stripMargin

  // --------------------------------------------------------------- z-order

  /** Quantization width for the q105 z-order values. */
  private val ZBits = 16

  /** Q105 — Z-order layout values: every event's Morton interleave over
    * (user_id, value), the single sort key that clusters BOTH
    * dimensions for write-side data skipping (see
    * [[graft.operators.Layout.withZValue]]) — graded value-for-value,
    * so the quantization and bit interleave are checked exactly.
    */
  private def q105(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Layout.withZValue(
        Tables.events(spark, dir).select(col("event_id"), col("user_id"),
          col("value")),
        Seq("user_id", "value"), bits = ZBits)
      .select(col("event_id"), col("z_value"))
      .orderBy("event_id")

  private val q105Sql =
    s"""WITH s AS (SELECT min(user_id)::DOUBLE AS mnu, max(user_id)::DOUBLE AS mxu,
       |                  min(value)::DOUBLE AS mnv, max(value)::DOUBLE AS mxv
       |           FROM events),
       |q AS (SELECT event_id,
       |             CASE WHEN mxu = mnu THEN 0 ELSE
       |               floor((user_id::DOUBLE - mnu) * ${(1L << ZBits) - 1}.0
       |                     / (mxu - mnu))::BIGINT END AS qu,
       |             CASE WHEN mxv = mnv THEN 0 ELSE
       |               floor((value - mnv) * ${(1L << ZBits) - 1}.0
       |                     / (mxv - mnv))::BIGINT END AS qv
       |      FROM events, s)
       |SELECT event_id, list_sum(list_transform(range(0, $ZBits),
       |         b -> (((qu >> b) & 1) << (2*b)) + (((qv >> b) & 1) << (2*b + 1))
       |       ))::BIGINT AS z_value
       |FROM q ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------- EWMA smooth

  /** Smoothing factor / trailing-frame width for the q108 EWMA. */
  private val EwmaAlpha = 0.3
  private val EwmaWindow = 8

  /** Q108 — per-user EWMA telemetry smoothing: the recursive
    * `acc = alpha * x + (1 - alpha) * acc` fold over each row's trailing
    * $EwmaWindow-observation frame, plus the residual the monitoring
    * rules threshold (see [[TimeSeries.ewmaSmooth]]) — graded
    * value-for-value, so the fold order and seeding are checked exactly
    * (the codegen kernel and the oracle's `list_reduce` are both strict
    * oldest-first left folds).
    */
  private def q108(spark: SparkSession, dir: String): DataFrame =
    QueryDefs.orderByOnce(TimeSeries.ewmaSmooth(Tables.events(spark, dir),
        keyCol = "user_id", tsCol = "ts", idCol = "event_id",
        valueCol = "value", alpha = EwmaAlpha, window = EwmaWindow),
      col("user_id"), col("event_id"))

  private val q108Sql =
    s"""WITH w AS (SELECT user_id, event_id, value,
       |                  list(value::DOUBLE) OVER (
       |                    PARTITION BY user_id ORDER BY ts, event_id
       |                    ROWS BETWEEN ${EwmaWindow - 1} PRECEDING
       |                         AND CURRENT ROW) AS vals
       |           FROM events)
       |SELECT user_id, event_id, value,
       |       floor(list_reduce(vals, (acc, x) ->
       |               ($EwmaAlpha)::DOUBLE * x
       |             + (${1.0 - EwmaAlpha})::DOUBLE * acc)
       |             * 1000000.0 + 0.5) / 1000000.0 AS ewma,
       |       floor((value - list_reduce(vals, (acc, x) ->
       |               ($EwmaAlpha)::DOUBLE * x
       |             + (${1.0 - EwmaAlpha})::DOUBLE * acc))
       |             * 1000000.0 + 0.5) / 1000000.0 AS deviation
       |FROM w ORDER BY user_id, event_id""".stripMargin

  /** q125 CUSUM parameters: trailing-frame width (the detection
    * horizon), slack and alarm in robust sigmas.
    */
  private val CusumWindow = 16
  private val CusumSlack = 0.5
  private val CusumAlarm = 4.0

  /** Q125 — windowed CUSUM drift detection per event type (Page 1954):
    * both one-sided cumulative sums folded over each row's trailing
    * $CusumWindow observations with median/MAD-derived target and
    * slack (see [[TimeSeries.cusum]]) — the sustained-small-shift
    * detector complementing q122's per-point robust z-score. Graded
    * value-for-value: fold order, the zero seed, and the robust
    * parameterization are all checked.
    */
  private def q125(spark: SparkSession, dir: String): DataFrame =
    QueryDefs.orderByOnce(TimeSeries.cusum(Tables.events(spark, dir),
        keyCol = "event_type", tsCol = "ts", idCol = "event_id",
        valueCol = "value", window = CusumWindow,
        slackSigmas = CusumSlack, alarmSigmas = CusumAlarm),
      col("event_type"), col("event_id"))

  private val q125Sql =
    s"""WITH med AS (SELECT event_type,
       |               round(quantile_cont(value, 0.5), 6) AS med
       |             FROM events GROUP BY 1),
       |dev AS (SELECT e.event_type, abs(e.value - m.med) AS ad
       |        FROM events e JOIN med m USING (event_type)),
       |mad AS (SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad
       |        FROM dev GROUP BY 1),
       |st AS (SELECT m.event_type, m.med,
       |         floor(a.mad * 1.4826 * 1000000.0 + 0.5) / 1000000.0
       |           AS sigma
       |       FROM med m JOIN mad a USING (event_type)
       |       WHERE a.mad <> 0),
       |w AS (SELECT e.event_type, e.event_id, e.value, st.med, st.sigma,
       |        list(e.value::DOUBLE) OVER (
       |          PARTITION BY e.event_type ORDER BY e.ts, e.event_id
       |          ROWS BETWEEN ${CusumWindow - 1} PRECEDING
       |               AND CURRENT ROW) AS vals
       |      FROM events e JOIN st USING (event_type)),
       |z AS (SELECT event_type, event_id, value,
       |        floor(list_reduce(list_prepend(0.0, vals), (acc, x) ->
       |                greatest(0, acc + x - (med + $CusumSlack * sigma)))
       |              * 1000000.0 + 0.5) / 1000000.0 AS cusum_hi,
       |        floor(list_reduce(list_prepend(0.0, vals), (acc, x) ->
       |                greatest(0, acc - x - ($CusumSlack * sigma - med)))
       |              * 1000000.0 + 0.5) / 1000000.0 AS cusum_lo,
       |        sigma
       |      FROM w)
       |SELECT event_type, event_id, value, cusum_hi, cusum_lo, sigma,
       |       (cusum_hi > $CusumAlarm * sigma
       |        OR cusum_lo > $CusumAlarm * sigma) AS alarm
       |FROM z ORDER BY event_type, event_id""".stripMargin

  // --------------------------------------------------------- dataset split

  /** Q41 — permanent train/val/test membership (80/10/10) for every
    * document: a pure hash of the row id (see [[Splits]] for why not
    * `randomSplit`), graded row-for-row.
    */
  private def q41(spark: SparkSession, dir: String): DataFrame =
    Splits.withSplit(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      .orderBy("doc_id")

  private val q41Sql =
    """SELECT doc_id, lang,
      |       CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM (SELECT doc_id, lang,
      |        ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100 AS b
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tf-idf

  /** Q42 — top-3 TF-IDF terms per document (deterministic tie-break by
    * term; see [[TfIdf.topTerms]] for the two-shuffle plan shape).
    */
  private def q42(spark: SparkSession, dir: String): DataFrame =
    TfIdf.topTerms(Tables.documents(spark, dir), "doc_id", "text", topK = 3)
      .withColumn("score", r6(col("score")))
      .orderBy("doc_id", "rank")

  private val q42Sql =
    """WITH toks AS (SELECT doc_id,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                t -> t != '')) AS term
      |       FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (SELECT doc_id, term, tf * ln(n_docs / df) AS score
      |      FROM tf JOIN df USING (term), n),
      |r AS (SELECT doc_id, term, score,
      |        row_number() OVER (PARTITION BY doc_id
      |                           ORDER BY score DESC, term) AS rank
      |      FROM s)
      |SELECT doc_id, rank, term, round(score, 6) AS score
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // -------------------------------------------------------------- quantiles

  /** Q43 — per-event-type value quantiles, exact (`percentile_cont`
    * semantics). Bounded key domain makes exact safe here; the unbounded
    * case goes through [[Quantiles.approx]] (tolerance-tested, not
    * oracle-graded — sketch internals are engine-private).
    */
  private def q43(spark: SparkSession, dir: String): DataFrame =
    Quantiles.exact(Tables.events(spark, dir), "event_type", "value",
        Seq(0.5, 0.9, 0.99))
      .orderBy("event_type")

  private val q43Sql =
    """SELECT event_type,
      |       round(quantile_cont(value, 0.5), 6) AS p50,
      |       round(quantile_cont(value, 0.9), 6) AS p90,
      |       round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q172 — bottom-k hash-sample quantiles (see
    * [[graft.operators.Quantiles.sampled]]): q43's percentile report
    * recomputed the way it survives unbounded groups — a deterministic
    * k=512 bottom-hash row sample per event type, exact type-1
    * quantiles of the sample. The family's third member: exact
    * (full-group buffer), approx (t-digest, tolerance-only), sampled
    * (bounded AND bit-gradeable). The oracle restates the identical
    * sample selection and rank pick.
    */
  private def q172(spark: SparkSession, dir: String): DataFrame =
    Quantiles.sampled(Tables.events(spark, dir), "event_type", "value",
        "event_id", k = 512, ps = Seq(0.5, 0.9, 0.99))
      .orderBy("event_type")

  private val q172Sql =
    """WITH s AS (SELECT event_type, value, event_id,
      |        ('0x' || substr(md5('squant:' || event_id::VARCHAR),
      |                        1, 15))::BIGINT AS h
      |      FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |                                   ORDER BY h, event_id) AS rn
      |      FROM s),
      |smp AS (SELECT * FROM r WHERE rn <= 512),
      |q AS (SELECT *,
      |        row_number() OVER (PARTITION BY event_type
      |                           ORDER BY value, h, event_id) AS rq,
      |        count(*) OVER (PARTITION BY event_type) AS m
      |      FROM smp)
      |SELECT event_type, max(m)::BIGINT AS sample_n,
      |       max(CASE WHEN rq = greatest(1, ceil(0.5 * m))::BIGINT
      |                THEN round(value, 6) END) AS p50,
      |       max(CASE WHEN rq = greatest(1, ceil(0.9 * m))::BIGINT
      |                THEN round(value, 6) END) AS p90,
      |       max(CASE WHEN rq = greatest(1, ceil(0.99 * m))::BIGINT
      |                THEN round(value, 6) END) AS p99
      |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q122 — robust outlier report: per-type MODIFIED z-score
    * (Iglewicz–Hoaglin median/MAD, see
    * [[graft.operators.Quantiles.madOutliers]]) — the 50%-breakdown
    * complement of q06's fixed rule thresholds: the outliers can't
    * inflate the estimator and mask each other, and no per-type
    * constants need maintaining. Emits only the flagged rows.
    */
  private def q122(spark: SparkSession, dir: String): DataFrame =
    Quantiles.madOutliers(
        Tables.events(spark, dir)
          .select(col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("rob_z"))
      .orderBy("event_id")

  private val q122Sql =
    """WITH med AS (SELECT event_type,
      |               round(quantile_cont(value, 0.5), 6) AS med
      |             FROM events GROUP BY 1),
      |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
      |               abs(e.value - m.med) AS ad
      |        FROM events e JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, round(quantile_cont(ad, 0.5), 6) AS mad
      |        FROM dev GROUP BY 1),
      |z AS (SELECT d.event_id, d.event_type, d.value, d.med, a.mad,
      |             round(0.6745 * (d.value - d.med) / a.mad, 6) AS rob_z
      |      FROM dev d JOIN mad a USING (event_type)
      |      WHERE a.mad <> 0)
      |SELECT event_id, event_type, value, med, mad, rob_z
      |FROM z WHERE abs(rob_z) > 3.5 ORDER BY event_id""".stripMargin

  /** The q123 funnel: signup → click → purchase, in strict order. */
  private val FunnelStages = Seq("signup", "click", "purchase")

  /** Q123 — ordered conversion funnel (see
    * [[graft.operators.Sessionize.funnel]]): per user the first signup,
    * the first click strictly after it, the first purchase strictly
    * after that — later stages only count in order. One conditional-min
    * aggregate per stage on one key-pinned exchange.
    */
  private def q123(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.funnel(
        Tables.events(spark, dir)
          .select(col("user_id"), col("event_type"),
            tsUs(col("ts")).as("ts_us")),
        "user_id", "event_type", "ts_us", FunnelStages)
      .orderBy("user_id")

  private val q123Sql =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu
      |           FROM events),
      |s1 AS (SELECT user_id,
      |         min(CASE WHEN event_type = 'signup' THEN tu END) AS t1
      |       FROM e GROUP BY 1),
      |s2 AS (SELECT e.user_id, max(s1.t1) AS t1,
      |         min(CASE WHEN event_type = 'click' AND tu > s1.t1
      |             THEN tu END) AS t2
      |       FROM e JOIN s1 USING (user_id) GROUP BY 1),
      |s3 AS (SELECT e.user_id, max(s2.t1) AS t1, max(s2.t2) AS t2,
      |         min(CASE WHEN event_type = 'purchase' AND tu > s2.t2
      |             THEN tu END) AS t3
      |       FROM e JOIN s2 USING (user_id) GROUP BY 1)
      |SELECT user_id, t1, t2, t3,
      |       (CASE WHEN t3 IS NOT NULL THEN 3
      |             WHEN t2 IS NOT NULL THEN 2
      |             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |         AS stage_reached
      |FROM s3 ORDER BY user_id""".stripMargin

  /** Q124 — cohort retention triangle (see
    * [[graft.operators.Sessionize.cohortRetention]]): users cohorted by
    * first-signup day, cells count users active N days later — the
    * companion read of the q123 funnel. Output bounded by days², not
    * users.
    */
  private def q124(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.cohortRetention(
        Tables.events(spark, dir), "user_id", "ts",
        col("event_type") === "signup")
      .orderBy("cohort_day", "day_offset")

  private val q124Sql =
    """WITH d AS (SELECT user_id, ts::DATE AS day, event_type FROM events),
      |c AS (SELECT user_id, min(day) AS cohort
      |      FROM d WHERE event_type = 'signup' GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, day FROM d)
      |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_day,
      |       (a.day - c.cohort)::BIGINT AS day_offset,
      |       count(*)::BIGINT AS n_users
      |FROM a JOIN c USING (user_id)
      |WHERE a.day >= c.cohort
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------- rollup / pivot / clip

  /** Q44 — hierarchical rollup (day × event_type → day → grand total):
    * Spark's `rollup` plans ONE Expand + one aggregate for all three
    * grouping levels — one shuffle, not three union'd aggregations.
    * Subtotal rows are labeled 'ALL' so every graded column stays
    * non-null string/long/double.
    */
  private def q44(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .rollup(dayStr(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"))
      .select(
        coalesce(col("day"), lit("ALL")).as("day"),
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n"), col("avg_value"))
      .orderBy("day", "event_type")

  private val q44Sql =
    """SELECT coalesce(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
      |       coalesce(event_type, 'ALL') AS event_type,
      |       count(*) AS n, round(avg(value), 6) AS avg_value
      |FROM events
      |GROUP BY ROLLUP (strftime(ts, '%Y-%m-%d'), event_type)
      |ORDER BY day, event_type""".stripMargin

  /** The event-type domain for the pivot — explicit, so the plan needs
    * no driver-side distinct scan to discover columns (the at-scale
    * rule: pivot with an enumerated domain is one aggregate; pivot
    * without one is a full extra pass + a collect).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Q45 — pivot: per-day event counts, one column per event type. */
  private def q45(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("day")

  private val q45Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |       count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |       count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |       count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |       count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |       count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Q46 — winsorized per-type value stats: clip into the per-group
    * [p1, p99] quantile range, then aggregate — mean, and how many rows
    * each tail clipped.
    */
  private def q46(spark: SparkSession, dir: String): DataFrame =
    Quantiles.winsorized(Tables.events(spark, dir), "event_type", "value",
        loP = 0.01, hiP = 0.99)
      .groupBy(col("event_type"))
      .agg(
        r6(avg(col("value_w"))).as("wins_mean"),
        count(when(col("value_w") > col("value"), 1)).as("clipped_low"),
        count(when(col("value_w") < col("value"), 1)).as("clipped_high"))
      .orderBy("event_type")

  private val q46Sql =
    """WITH b AS (SELECT event_type,
      |             round(quantile_cont(value, 0.01), 6) AS lo,
      |             round(quantile_cont(value, 0.99), 6) AS hi
      |           FROM events GROUP BY 1),
      |w AS (SELECT e.event_type, e.value,
      |        greatest(b.lo, least(b.hi, e.value)) AS value_w
      |      FROM events e JOIN b USING (event_type))
      |SELECT event_type, round(avg(value_w), 6) AS wins_mean,
      |       count(CASE WHEN value_w > value THEN 1 END) AS clipped_low,
      |       count(CASE WHEN value_w < value THEN 1 END) AS clipped_high
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  // -------------------------------------------------- set ops / windows

  /** Q47 — set operations over (user, day) activity sets: days a user
    * clicked but never purchased (EXCEPT → anti-join), did both
    * (INTERSECT → semi-join), did either (UNION DISTINCT → aggregate).
    * All three run on the same two deduplicated frames; the three 1-row
    * counts cross-join for a single graded row.
    */
  private def q47(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def days(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), dayStr(col("ts")).as("day")).distinct()
    val c = days("click")
    val p = days("purchase")
    c.except(p).agg(count(lit(1)).as("click_only_days"))
      .crossJoin(c.intersect(p).agg(count(lit(1)).as("both_days")))
      .crossJoin(c.union(p).distinct().agg(count(lit(1)).as("any_days")))
  }

  private val q47Sql =
    """WITH c AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS day
      |      FROM events WHERE event_type = 'purchase')
      |SELECT
      |  (SELECT count(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p)) AS click_only_days,
      |  (SELECT count(*) FROM (SELECT * FROM c INTERSECT SELECT * FROM p)) AS both_days,
      |  (SELECT count(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) AS any_days""".stripMargin

  /** Q48 — the analytic window family over per-type daily counts:
    * day-over-day delta (`lag`), busiest-day rank (`rank`), month
    * quartile (`ntile`), and `cume_dist` — one shuffle on event_type,
    * all four functions sharing two window sorts.
    */
  private def q48(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val byCount = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("day"))
    Tables.events(spark, dir)
      .groupBy(dayStr(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("day"), col("event_type"), col("n"),
        (col("n") - coalesce(lag(col("n"), 1).over(byDay), col("n"))).as("dod_delta"),
        rank().over(byCount).as("busiest_rank"),
        ntile(4).over(byDay).as("quartile"),
        r6(cume_dist().over(byCount)).as("cume"))
      .orderBy("event_type", "day")
  }

  private val q48Sql =
    """WITH d AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      |             count(*) AS n
      |           FROM events GROUP BY 1, 2)
      |SELECT day, event_type, n,
      |       n - coalesce(lag(n, 1) OVER (PARTITION BY event_type ORDER BY day), n) AS dod_delta,
      |       rank() OVER (PARTITION BY event_type ORDER BY n DESC, day) AS busiest_rank,
      |       ntile(4) OVER (PARTITION BY event_type ORDER BY day) AS quartile,
      |       round(cume_dist() OVER (PARTITION BY event_type ORDER BY n DESC, day), 6) AS cume
      |FROM d ORDER BY event_type, day""".stripMargin

  // -------------------------------------------------------- dedup clusters

  /** Q49 — pairs → dedup decisions: connected components over the exact
    * n-gram-Jaccard near-dup pairs (q21's output); each doc's `cluster`
    * is the minimum transitively-connected id, i.e. the canonical keeper
    * — `doc_id != cluster` rows are the drop set. Iterative min-label
    * propagation, 2–3 rounds on near-dup graphs (see
    * [[graft.operators.Dedup.connectedComponents]]).
    */
  private def q49(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    val pairs = SharedFrames.ngramPairs(spark, dir)
    Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp").as("cluster"))
      .orderBy("doc_id")
  }

  /** Oracle: transitive closure via a recursive CTE over the same pair
    * CTE as q21, component = min reachable id.
    */
  private val q49Sql =
    s"""WITH RECURSIVE ${PipelineQueries.ngramPairsCte},
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE inter / (sz_a + sz_b - inter) >= 0.6),
       |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
       |reach AS (SELECT a, b FROM e
       |          UNION
       |          SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin

  /** q126 PageRank parameters. */
  private val PrIters = 5
  private val PrDamping = 0.85

  /** Q126 — PageRank centrality over the q21 near-dup graph (Page et
    * al. 1999): high-rank docs sit in DENSE duplication neighborhoods
    * (template families worth auditing before dedup elects keepers) —
    * a signal cluster size alone misses (see
    * [[graft.operators.Dedup.pageRank]]). The oracle unrolls all
    * $PrIters power-iteration rounds over the same pair CTE as
    * q21/q49; per-node contributions are integer-quantized then
    * summed, so both engines aggregate exactly, order-free.
    */
  private def q126(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.pageRank(SharedFrames.ngramPairs(spark, dir),
        iters = PrIters, damping = PrDamping)
      .orderBy("id")
  }

  private val q126Sql = {
    val d = PrDamping.toString
    val om = (1.0 - PrDamping).toString
    // contributions are 1e-12-integer-quantized then long-summed (the
    // q119 trick) — exact and order-free on both engines, no per-node
    // ordered list fold
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT e.dst AS id,
         |         $om / nn.n + $d *
         |           (sum(floor(r${i - 1}.r / dg.deg * 1e12 + 0.5)::BIGINT)
         |            / 1e12) AS r
         |  FROM e JOIN r${i - 1} ON r${i - 1}.id = e.src
         |         JOIN dg ON dg.src = e.src, nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }
    s"""WITH ${PipelineQueries.ngramPairsCte},
       |e0 AS (SELECT id_a AS a, id_b AS b FROM p
       |       WHERE inter / (sz_a + sz_b - inter) >= 0.6),
       |e AS MATERIALIZED (SELECT a AS src, b AS dst FROM e0
       |                   UNION SELECT b, a FROM e0),
       |dg AS MATERIALIZED (SELECT src, count(*)::BIGINT AS deg
       |                    FROM e GROUP BY 1),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM dg),
       |r0 AS MATERIALIZED (SELECT src AS id, 1.0 / nn.n AS r FROM dg, nn),
       |${rounds.mkString(",\n")}
       |SELECT r.id, dg2.deg, round(r.r, 6) AS rank
       |FROM r$PrIters r JOIN dg dg2 ON dg2.src = r.id
       |ORDER BY r.id""".stripMargin
  }

  // ---------------------------------------------------- stratified sample

  /** Q51 — deterministic stratified sample of the corpus: keep 50% of
    * English, 25% of German, 10% of everything else, membership a pure
    * function of doc_id — graded row-for-row (the exact sampled set,
    * not just counts).
    */
  private def q51(spark: SparkSession, dir: String): DataFrame =
    Splits.stratifiedSample(
        Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang", fractions = Map("en" -> 50, "de" -> 25),
        defaultKeep = 10)
      .orderBy("doc_id")

  private val q51Sql =
    """SELECT doc_id, lang FROM documents
      |WHERE ('0x' || substr(md5('strata:' || doc_id::VARCHAR), 1, 15))::BIGINT % 100
      |      < CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 25 ELSE 10 END
      |ORDER BY doc_id""".stripMargin

  /** Q55 — unpivot/melt (the inverse of q45): the wide day×type frame
    * melts back to long form via `Dataset.unpivot`, and must round-trip
    * to exactly the plain grouped counts — the oracle IS that plain
    * aggregate (fill-zeros from the pivot are dropped, since a GROUP BY
    * never emits absent combinations).
    */
  private def q55(spark: SparkSession, dir: String): DataFrame =
    q45(spark, dir)
      .unpivot(Array(col("day")), EventTypes.map(col).toArray,
        "event_type", "n")
      .filter(col("n") > 0)
      .orderBy("day", "event_type")

  private val q55Sql =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------- snapshot diff

  /** Q54 — snapshot diff: two deterministic "crawls" derived from the
    * corpus (old = ids < 400; new = ids >= 100 with every 7th document
    * edited) classified added/removed/changed/unchanged by content
    * fingerprint — graded row-for-row.
    */
  private def q54(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Snapshot
    val docs = Tables.documents(spark, dir)
    val old = docs.filter(col("doc_id") < 400).select(col("doc_id"), col("text"))
    val neu = docs.filter(col("doc_id") >= 100)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(7)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
    Snapshot.diff(old, neu, "doc_id", "text").orderBy("doc_id")
  }

  private val q54Sql =
    """WITH o AS (SELECT doc_id,
      |             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |           FROM documents WHERE doc_id < 400),
      |n AS (SELECT doc_id,
      |        md5(trim(regexp_replace(lower(
      |          CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END),
      |          '\s+', ' ', 'g'))) AS fp
      |      FROM documents WHERE doc_id >= 100)
      |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      |       CASE WHEN o.doc_id IS NULL THEN 'added'
      |            WHEN n.doc_id IS NULL THEN 'removed'
      |            WHEN o.fp = n.fp THEN 'unchanged'
      |            ELSE 'changed' END AS status
      |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- histogram

  /** Q53 — fixed-bin value histogram per event type, `width_bucket`
    * semantics (bins 1..32 over [0, 256), underflow 0 / overflow 33)
    * spelled as explicit floor arithmetic — DuckDB 1.0 has no
    * width_bucket, and identical `floor(v/8.0)` doubles on both sides
    * grade exactly. One aggregation — the workhorse of distribution
    * dashboards at any scale.
    */
  private def q53(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        when(col("value") < 0.0, 0)
          .when(col("value") >= 256.0, 33)
          .otherwise(floor(col("value") / lit(8.0)).cast("int") + 1)
          .as("bucket"))
      .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"))
      .orderBy("event_type", "bucket")

  private val q53Sql =
    """SELECT event_type,
      |       CASE WHEN value < 0.0 THEN 0 WHEN value >= 256.0 THEN 33
      |            ELSE floor(value / 8.0)::INT + 1 END AS bucket,
      |       count(*) AS n, round(avg(value), 6) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------------- bloom

  private val BloomWords = 16
  private val BloomK = 3

  /** Q52 — the portable Bloom filter built over click users, graded
    * word-for-word: the filter is pure bit algebra over portable hashes,
    * so the oracle reconstructs the identical (word, bits) rows.
    */
  private def q52(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bloom.build(
        Tables.events(spark, dir).filter(col("event_type") === "click"),
        col("user_id"), words = BloomWords, k = BloomK)
      .orderBy("word")

  private val q52Sql =
    s"""WITH p AS (
       |  SELECT h % $BloomWords AS word, (h // $BloomWords) % 64 AS bit
       |  FROM (SELECT ('0x' || substr(md5('bloom' || i || ':' || user_id::VARCHAR), 1, 15))::BIGINT AS h
       |        FROM events CROSS JOIN range(0, $BloomK) t(i)
       |        WHERE event_type = 'click'))
       |SELECT word,
       |       bit_or(CASE WHEN bit = 63 THEN (-9223372036854775807 - 1)
       |                   ELSE 1::BIGINT << bit::INTEGER END) AS bits
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------- k-means step

  private val KmSeeds = 8

  /** Q50 — one graded spherical k-means step (quantizer training): the
    * 8 lowest-id embeddings seed the centroids, every vector is assigned
    * to its max-cosine centroid in-row, and each cell emits its size and
    * elementwise-mean centroid — rounded to 6, so the trained model is
    * engine-reproducible. Graded flat as (cell, n, pos, m) rows: the
    * harness compare sorts column values in pandas, which cannot order an
    * ARRAY column, so the centroid is exploded to scalars for grading.
    */
  private def q50(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, dir)
    // iters = 0 returns exactly the deterministic lowest-id seeds — the
    // ONE definition of seeding, shared with the trainer loop
    val seeds = Similarity.kMeansCentroids(emb, "vec_id", "embedding",
      k = KmSeeds, iters = 0)
    Similarity.kMeansStep(emb, "vec_id", "embedding", seeds)
      .select(col("cell"), col("n"),
        posexplode(col("centroid")).as(Seq("p", "m")))
      .select(col("cell"), col("n"), col("p").cast("long").as("pos"), col("m"))
  }

  private val q50Sql =
    s"""WITH c AS (SELECT vec_id AS cent, embedding AS ce FROM embeddings
       |           ORDER BY vec_id LIMIT $KmSeeds),
       |aff AS (SELECT e.vec_id, c.cent,
       |          ${PipelineQueries.cosSql("e.embedding", "c.ce")} AS cs
       |        FROM embeddings e, c),
       |cell AS (SELECT vec_id, cent FROM (
       |           SELECT vec_id, cent,
       |                  row_number() OVER (PARTITION BY vec_id
       |                                     ORDER BY (0.0 - cs), cent) AS rn
       |           FROM aff) WHERE rn = 1),
       |x AS (SELECT cell.cent AS cell, e.embedding AS emb
       |      FROM embeddings e JOIN cell USING (vec_id)),
       |n AS (SELECT cell, count(*) AS n FROM x GROUP BY 1),
       |p AS (SELECT cell, i AS pos, avg(emb[i + 1]) AS m
       |      FROM x CROSS JOIN range(0, 64) t(i) GROUP BY 1, 2)
       |SELECT p.cell, n.n, p.pos, round(p.m, 6) AS m
       |FROM p JOIN n USING (cell) ORDER BY p.cell, p.pos""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q38_asof_join", q38, Some(q38Sql)),
    QueryDef("q39_interval_overlap", q39, Some(q39Sql)),
    QueryDef("q40_kmv_distinct", q40, Some(q40Sql)),
    QueryDef("q41_dataset_split", q41, Some(q41Sql)),
    QueryDef("q42_tfidf_topterms", q42, Some(q42Sql)),
    QueryDef("q43_quantiles", q43, Some(q43Sql)),
    QueryDef("q44_rollup", q44, Some(q44Sql)),
    QueryDef("q45_pivot", q45, Some(q45Sql)),
    QueryDef("q46_winsorize", q46, Some(q46Sql)),
    QueryDef("q47_set_ops", q47, Some(q47Sql)),
    QueryDef("q48_window_family", q48, Some(q48Sql)),
    QueryDef("q49_dedup_clusters", q49, Some(q49Sql)),
    QueryDef("q50_kmeans_step", q50, Some(q50Sql)),
    QueryDef("q51_stratified_sample", q51, Some(q51Sql)),
    QueryDef("q52_bloom_filter", q52, Some(q52Sql)),
    QueryDef("q53_histogram", q53, Some(q53Sql)),
    QueryDef("q54_snapshot_diff", q54, Some(q54Sql)),
    QueryDef("q55_unpivot", q55, Some(q55Sql)),
    QueryDef("q100_cms_estimate", q100, Some(q100Sql)),
    QueryDef("q118_heavy_hitters", q118, Some(q118Sql)),
    QueryDef("q122_mad_outliers", q122, Some(q122Sql)),
    QueryDef("q123_funnel", q123, Some(q123Sql)),
    QueryDef("q125_cusum_drift", q125, Some(q125Sql)),
    QueryDef("q126_dedup_pagerank", q126, Some(q126Sql)),
    QueryDef("q124_cohort_retention", q124, Some(q124Sql)),
    QueryDef("q105_zorder_value", q105, Some(q105Sql)),
    QueryDef("q108_ewma_smooth", q108, Some(q108Sql)),
    QueryDef("q172_sampled_quantiles", q172, Some(q172Sql)))
}
