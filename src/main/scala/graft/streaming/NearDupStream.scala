package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFns
import graft.operators.Dedup

/** Streaming near-duplicate detection — the real-time twin of the batch
  * MinHash+LSH path (q22): each arriving document's banded MinHash
  * signature keys it into band buckets, per-bucket streaming state
  * remembers recent members, and a new arrival emits a candidate pair
  * against every current member of any bucket it lands in. The
  * ingest-time building block of "have we already crawled this page"
  * dedup, with the SAME banding math as the batch operator (a candidate
  * emitted here is exactly a candidate the batch job would generate).
  *
  * Candidates, not verdicts: exact Jaccard verification needs both
  * documents' full shingle sets, which per-bucket state deliberately
  * does not carry (it would multiply state size by document length) —
  * verify candidates downstream against the store, as the batch path
  * does. A pair sharing multiple bands is emitted once per shared
  * bucket; de-duplicate downstream (e.g.
  * `dropDuplicatesWithinWatermark`).
  *
  * State is bounded two ways: each bucket retains its FIRST `maxBucket`
  * members as standing representatives (see [[NearDupStream.bucketCandidates]]
  * — later arrivals in a full bucket emit candidates against the
  * representatives but do not join; a hot bucket is boilerplate, same
  * pathology as the batch hot-bucket cap), and a whole bucket expires
  * by EVENT-TIME timeout once the watermark passes its last activity +
  * `retention`, so an unbounded stream holds state only for the recency
  * window that matters.
  */
/** A near-dup candidate: `doc_id` arrived and collided with the earlier
  * `prior_id` in some band bucket. (Top-level, as are the state classes
  * below: a case class nested in an object breaks the state encoder's
  * generated code — "No applicable constructor/method found".)
  */
case class NearDupCandidate(doc_id: Long, prior_id: Long)

private[streaming] case class BucketMember(id: Long, tsUs: Long)

/** Per-bucket state: the retained representatives plus the bucket's
  * LAST-ACTIVITY event time. `lastUs` is persisted separately from the
  * member list because first-seen retention FREEZES the members once
  * the bucket fills — re-deriving last activity from member timestamps
  * plus only the current trigger's arrivals would forget a newer
  * arrival's event time in a full bucket, letting a later out-of-order
  * (older-ts) arrival move the timeout BACKWARD and expire the bucket
  * earlier than the documented "last activity + retention" (round-19
  * ADVICE).
  */
private[streaming] case class NearDupBucketState(members: List[BucketMember],
                                                 lastUs: Long = 0L)

object NearDupStream {

  /** Candidate stream over documents (`doc_id: long, ts: timestamp,
    * text: string`). `bands` divides 64; collision probability per band
    * is J^(64/bands) — (32 bands, 2 rows) catches J ≥ 0.6 with
    * near-certainty across 32 chances.
    */
  def candidates(docs: DataFrame, n: Int = 3, bands: Int = 32,
                 watermark: String = "10 minutes",
                 retentionUs: Long = 3600000000L,
                 maxBucket: Int = 64): Dataset[NearDupCandidate] = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val rows = 64 / bands
    val spark = docs.sparkSession
    import spark.implicits._

    val bucketKey = concat_ws(":",
      (col("band") +: (0 until rows).map(r =>
        element_at(col("sig"), col("band") * rows + r + 1))): _*)
    val keyed = docs.withWatermark("ts", watermark)
      .withColumn("sig",
        graft.expressions.MinHashSig(TextFns.shingles(col("text"), n), 64))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("doc_id"), col("ts"), bucketKey.as("bucket"))
      .as[(Long, java.sql.Timestamp, String)]
    bucketCandidates(keyed, retentionUs, maxBucket)
  }

  /** SEMANTIC streaming near-dup candidates — the same bucket-state
    * machinery keyed by the random-hyperplane LSH bands of each
    * document's FEATURE-HASHED embedding
    * (`Similarity.hashEmbedRowwise`'s kernel + the batch index's exact
    * plane model and graded 16×8-bit banding): two documents collide
    * when some 8-bit signature band matches, i.e. when their hashed
    * embeddings point the same way across 8 shared hyperplanes — the
    * ingest-time twin of the batch semantic pair path (q37/q69's
    * `lshNearDupPairs` at the graded `rowsPerBand = 8`), with no
    * trained model anywhere in the loop: raw text → embedding →
    * signature → bucket is three compiled kernels inside the
    * micro-batch projection. Same candidate (not verdict) contract and
    * state bounds as [[candidates]]; verify downstream with exact
    * cosine against the store.
    */
  def semanticCandidates(docs: DataFrame,
                         watermark: String = "10 minutes",
                         retentionUs: Long = 3600000000L,
                         maxBucket: Int = 64): Dataset[NearDupCandidate] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bands = graft.operators.Similarity.Bands
    val rows = 128 / bands
    val bucketKey = concat_ws(":",
      (col("band") +: (0 until rows).map(r =>
        element_at(col("sig"), col("band") * rows + r + 1))): _*)
    val keyed = docs.withWatermark("ts", watermark)
      .withColumn("e_d", graft.expressions.HashEmbedVec(
        TextFns.tokens(col("text")), 64))
      .withColumn("sig", graft.operators.Similarity.signature(col("e_d")))
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .select(col("doc_id"), col("ts"), bucketKey.as("bucket"))
      .as[(Long, java.sql.Timestamp, String)]
    bucketCandidates(keyed, retentionUs, maxBucket)
  }

  /** The shared per-bucket candidate state machine of [[candidates]]
    * and [[semanticCandidates]]: rows keyed (doc_id, ts, bucket); every
    * arrival emits a pair against each current member of its bucket,
    * and the bucket retains its FIRST `maxBucket` members as standing
    * REPRESENTATIVES — later arrivals emit candidates against them but
    * do not join the set. The bucket expires by event-time timeout
    * `retentionUs` past its last activity (tracked separately from the
    * member set, which stops changing once full).
    *
    * EVICTION POLICY (changed round 19, measured): the original
    * newest-kept/oldest-out window dropped exactly the EARLY members a
    * later duplicate must match — the batch↔stream parity SLO measured
    * 0.948 coverage at maxBucket=64 rising to 0.969/0.975 at 128/256
    * (PROBES_r19), i.e. eviction, not banding, dominated the
    * recoverable misses. First-seen retention matches the dedup
    * family's keeper election (the earliest member IS the cluster's
    * representative: `dup_of = min id` batch-side): every later
    * arrival in an overflowing bucket still collides with the retained
    * representatives, so cross-time pairs survive any bucket churn at
    * the same bounded state. The trade: two LATE arrivals in an
    * overflowing bucket no longer pair with each other directly — for
    * dedup semantics both still pair with the same representative
    * (transitively one cluster); a late-late pair sharing ONLY an
    * overflowed bucket is the residual miss class.
    */
  private[streaming] def bucketCandidates(
      keyed: Dataset[(Long, java.sql.Timestamp, String)],
      retentionUs: Long, maxBucket: Int): Dataset[NearDupCandidate] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .groupByKey(_._3)
      .flatMapGroupsWithState[NearDupBucketState, NearDupCandidate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state: GroupState[NearDupBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def micros(t: java.sql.Timestamp): Long =
              t.getTime / 1000 * 1000000L + t.getNanos / 1000
            var members = state.getOption.map(_.members).getOrElse(Nil)
            // last activity is STATE, not a derivation: the member list
            // freezes once full, so the newest member timestamp is not
            // the newest activity (round-19 ADVICE — see
            // [[NearDupBucketState]]); pre-lastUs states (0L default)
            // fall back to the old member-derived floor once
            var lastUs = state.getOption.map(_.lastUs).getOrElse(0L)
            if (lastUs == 0L)
              lastUs = members.headOption.map(_.tsUs).getOrElse(0L)
            val out = Seq.newBuilder[NearDupCandidate]
            rows.toSeq.sortBy(r => (micros(r._2), r._1)).foreach { case (id, ts, _) =>
              members.foreach(m => if (m.id != id) out += NearDupCandidate(id, m.id))
              lastUs = math.max(lastUs, micros(ts))
              if (members.lengthCompare(maxBucket) < 0 &&
                  !members.exists(_.id == id))
                members = BucketMember(id, micros(ts)) :: members
            }
            state.update(NearDupBucketState(members, lastUs))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs + 1,
                lastUs / 1000 + retentionUs / 1000))
            out.result().iterator
          }
      }
  }
}
