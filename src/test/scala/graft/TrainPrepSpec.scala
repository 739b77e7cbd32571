package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Curation, Dedup, Similarity}

/** Unit tests for the round-7 training-prep operators: contamination
  * scoring, incremental dedup, shard assignment, budgeted selection, the
  * BPE pair census, and the batched-retrieval/recall eval harness — each
  * against hand-computed answers on small fixtures.
  */
class TrainPrepSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  // --------------------------------------------------- contaminationScore

  test("contaminationScore emits clean and zero-gram docs at 0") {
    val bench = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "xx the quick brown fox jumps over yy"), // 4 grams, 2 shared
      (11L, "totally different words here now ok"),  // 2 grams, 0 shared
      (12L, "tiny")                                  // < n tokens: 0 grams
    ).toDF("doc_id", "text")
    val got = Curation.contaminationScore(corpus, bench, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (10L, 4L, 2L, 0.5),
      (11L, 2L, 0L, 0.0),
      (12L, 0L, 0L, 0.0)))
  }

  test("contaminationScoreRowwise equals the join-based scorer") {
    val bench = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "xx the quick brown fox jumps over yy"),
      (11L, "totally different words here now ok"),
      (12L, "tiny")
    ).toDF("doc_id", "text")
    val joined = Curation.contaminationScore(corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val rowwise = Curation.contaminationScoreRowwise(
        corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rowwise == joined)
  }

  test("contamination scorers drop null-text docs (never resurrect at 0,0,0)") {
    // the q73/q80 oracle pins this with WHERE text IS NOT NULL — a
    // null-text doc must be ABSENT from both scorers, not present at
    // (0, 0, 0.0) like a zero-gram doc
    val bench = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "xx the quick brown fox jumps over yy"),
      (11L, null.asInstanceOf[String]),
      (12L, "tiny")
    ).toDF("doc_id", "text")
    val joined = Curation.contaminationScore(corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val rowwise = Curation.contaminationScoreRowwise(
        corpus, bench, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(joined.map(_._1) == Seq(10L, 12L), s"null-text doc leaked: $joined")
    assert(rowwise == joined)
  }

  test("contaminationScoreRowwise runs on a stream (stateless micro-batches)") {
    implicit val ctx = sess.sqlContext
    val bench = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val scored = Curation.contaminationScoreRowwise(
      in.toDF().toDF("doc_id", "text"), bench, "doc_id", "text", n = 5)
    val q = scored.writeStream.format("memory")
      .queryName("graft_contam_stream").outputMode("append").start()
    try {
      in.addData((10L, "xx the quick brown fox jumps over yy"))
      q.processAllAvailable()
      in.addData((11L, "totally different words here now ok"), (12L, "tiny"))
      q.processAllAvailable()
      val got = spark.table("graft_contam_stream")
        .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
      assert(got.toSeq == Seq(
        (10L, 4L, 2L, 0.5),
        (11L, 2L, 0L, 0.0),
        (12L, 0L, 0L, 0.0)))
    } finally q.stop()
  }

  // ------------------------------------------- repetitionStatsRowwise

  test("repetitionStatsRowwise equals the aggregate-based signals") {
    val df = Seq(
      (1L, "a a b"), (2L, "x y z w"), (3L, "p p p q q r s p"),
      (4L, "solo")  // no bigrams: both paths must drop it
    ).toDF("doc_id", "text")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("doc_id")
        .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    val agg = canon(Curation.repetitionStats(df, "doc_id", "text"))
    val row = canon(Curation.repetitionStatsRowwise(df, "doc_id", "text"))
    assert(row == agg)
    assert(row.map(_._1) == Seq(1L, 2L, 3L)) // doc 4 dropped by both
  }

  test("streaming curation pass: rowwise signals + verdict over micro-batches") {
    implicit val ctx = sess.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val verdicts = Curation.qualityVerdict(
      Curation.repetitionStatsRowwise(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text"),
      "doc_id",
      Seq("too_short" -> (col("n_tokens") < 3),
          "low_diversity" -> (col("distinct_ratio") < 0.5)))
    val q = verdicts.writeStream.format("memory")
      .queryName("graft_verdict_stream").outputMode("append").start()
    try {
      in.addData((1L, "a a a a"), (2L, "fine healthy diverse document"))
      q.processAllAvailable()
      in.addData((3L, "b b"))
      q.processAllAvailable()
      val got = spark.table("graft_verdict_stream")
        .orderBy("doc_id").as[(Long, Long, String)].collect()
      assert(got.toSeq == Seq(
        (1L, 0L, "low_diversity"),
        (2L, 1L, ""),
        (3L, 0L, "too_short")))
    } finally q.stop()
  }

  test("curationPass: signals, contamination rule, and scrub in one stream pass") {
    implicit val ctx = sess.sqlContext
    val bench = Seq((1L, "the quick brown fox jumps over")).toDF("doc_id", "text")
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val pass = graft.operators.Curation.curationPass(
      in.toDF().toDF("doc_id", "text"), bench, "doc_id", "text",
      Seq("low_diversity" -> (col("distinct_ratio") < 0.5)))
    val q = pass.writeStream.format("memory")
      .queryName("graft_pass_stream").outputMode("append").start()
    try {
      in.addData(
        (10L, "call 555 1234 about the quick brown fox jumps over fence"),
        (11L, "spam spam spam spam"),
        (12L, "plenty of healthy diverse and original writing here"))
      q.processAllAvailable()
      val got = spark.table("graft_pass_stream")
        .select("doc_id", "n_overlap", "keep", "reasons", "scrubbed",
          "n_redactions")
        .orderBy("doc_id")
        .as[(Long, Long, Long, String, String, Long)].collect()
      // doc 10: contaminated (contains both bench 5-grams... it contains
      // "the quick brown fox jumps" and "quick brown fox jumps over") and
      // scrubbed (two digit runs); diverse so no quality rule fires
      assert(got(0) == (10L, 2L, 0L, "contaminated",
        "call <NUM> <NUM> about the quick brown fox jumps over fence", 2L))
      // doc 11: repetitive → low_diversity; clean of benchmark grams
      assert(got(1) == (11L, 0L, 0L, "low_diversity", "spam spam spam spam", 0L))
      // doc 12: kept untouched
      assert(got(2)._3 == 1L && got(2)._4 == "" && got(2)._6 == 0L)
    } finally q.stop()
  }

  test("exciseDuplicateSpans keeps one canonical copy of each dup span") {
    val df = Seq(
      (1L, "a b c d e x y"),   // owns "a b c d e" (min doc id)
      (2L, "z a b c d e w"),   // shares it -> positions 1..5 excised
      (3L, "p q r s t u")      // unique -> untouched
    ).toDF("doc_id", "text")
    val got = Curation.exciseDuplicateSpans(df, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(got(0) == (1L, 7L, 0L, "a b c d e x y")) // canonical keeps all
    assert(got(1) == (2L, 7L, 5L, "z w"))           // span excised
    assert(got(2) == (3L, 6L, 0L, "p q r s t u"))
    // a doc that is ENTIRELY a duplicated span of an earlier doc
    val wipe = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val w = Curation.exciseDuplicateSpans(wipe, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(w(0) == (1L, 5L, 0L, "a b c d e"))
    assert(w(1) == (2L, 5L, 5L, ""))
  }

  test("exciseContaminatedSpans removes only benchmark-covered tokens") {
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "intro the quick brown fox jumps outro"), // span at positions 1..5
      (11L, "totally clean text with nothing shared here")
    ).toDF("doc_id", "text")
    val got = Curation.exciseContaminatedSpans(corpus, bench,
        "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(got(0) == (10L, 7L, 5L, "intro outro"))
    assert(got(1) == (11L, 7L, 0L, "totally clean text with nothing shared here"))
  }

  // -------------------------------------------------- duplicatedSpanStats

  test("duplicatedSpanStats: shared 5-gram counts for both docs") {
    val df = Seq((1L, "a b c d e f"), (2L, "z a b c d e")).toDF("doc_id", "text")
    // doc1 grams: "a b c d e", "b c d e f"; doc2: "z a b c d", "a b c d e"
    // — "a b c d e" appears in both docs (df = 2)
    val got = Curation.duplicatedSpanStats(df, "doc_id", "text", n = 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  // -------------------------------------------------------- sourceOverlap

  test("sourceOverlap: full matrix with containment per ordered pair") {
    val df = Seq(
      (1L, "A", "x y"), (2L, "A", "p q"),
      (3L, "B", "y x"), // token-set dup of doc 1, different source
      (4L, "C", "r s")
    ).toDF("doc_id", "source", "text")
    val got = Curation.sourceOverlap(df, "source",
        TextFns.tokenSetKey(col("text")))
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("A", "B", 2L, 1L, 0.5),
      ("A", "C", 2L, 0L, 0.0),
      ("B", "A", 1L, 1L, 1.0),
      ("B", "C", 1L, 0L, 0.0),
      ("C", "A", 1L, 0L, 0.0),
      ("C", "B", 1L, 0L, 0.0)))
  }

  // ----------------------------------------------------------- deltaDedup

  test("deltaDedup classifies new / dup_of_corpus / dup_in_batch") {
    // token-set key: (1) and (2) collide ("a b"); incoming 10 collides
    // with them; 11/12 collide with each other only; 13 is unique
    val existing = Seq((1L, "a b"), (2L, "b a"), (3L, "c d"))
      .toDF("doc_id", "text")
    val incoming = Seq((10L, "a b"), (11L, "x y"), (12L, "y x"), (13L, "z"))
      .toDF("doc_id", "text")
    val got = Dedup.deltaDedup(existing, incoming, "doc_id",
        TextFns.tokenSetKey(col("text")))
      .orderBy("doc_id")
      .as[(Long, String, Option[Long])].collect()
    assert(got.toSeq == Seq(
      (10L, "dup_of_corpus", Some(1L)),
      (11L, "new", None),
      (12L, "dup_in_batch", Some(11L)),
      (13L, "new", None)))
  }

  // ---------------------------------------------------------- shardAssign

  test("shardAssign: shards in range, per-shard positions contiguous, deterministic") {
    val df = Seq.tabulate(100)(i => Tuple1(i.toLong)).toDF("id")
    val got = Curation.shardAssign(df, "id", numShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(got.length == 100)
    assert(got.forall { case (_, s, _) => s >= 0 && s < 4 })
    // every shard's positions are exactly 0..count-1
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // no shard is empty at 100 rows / 4 shards (hash spread sanity)
    assert(got.map(_._2).distinct.length == 4)
    val again = Curation.shardAssign(df, "id", numShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  // --------------------------------------------------- budgetedSelection

  test("budgetedSelection keeps quality-ranked docs until the budget is spent") {
    val df = Seq(
      (1L, "en", 0.7, 30L), (2L, "en", 0.9, 50L), (3L, "en", 0.8, 40L),
      (4L, "de", 0.5, 10L)
    ).toDF("id", "lang", "q", "n")
    val got = Curation.budgetedSelection(df, "id", "lang", col("q"), col("n"),
        budget = 90L)
      .orderBy("id")
      .as[(Long, String, Double, Long, Long, Long, Long)].collect()
    // en ranking: 2 (0.9, cum 50), 3 (0.8, cum 90), 1 (0.7, cum 120)
    // keep iff cum - n < 90: doc 2 (0 < 90) and doc 3 (50 < 90) kept;
    // doc 1 dropped (90 is not < 90) — the at-most-one-overflow law
    assert(got.map(r => (r._1, r._5, r._6, r._7)).toSeq == Seq(
      (1L, 3L, 120L, 0L),
      (2L, 1L, 50L, 1L),
      (3L, 2L, 90L, 1L),
      (4L, 1L, 10L, 1L)))
  }

  // -------------------------------------------------------- bpePairCounts

  test("bpePairCounts weights pairs by word frequency; 1-char words drop") {
    val df = Seq((1L, "aa ab a"), (2L, "aa")).toDF("id", "text")
    // words: aa ×2, ab ×1, a ×1 (dropped) → pairs: aa→2, ab→1
    val got = Curation.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("aa", 2L), ("ab", 1L)))
  }

  test("bpePairCounts counts overlapping in-word pairs once per occurrence") {
    val df = Seq((1L, "abab")).toDF("id", "text")
    // pairs of "abab": ab, ba, ab → ab:2, ba:1
    val got = Curation.bpePairCounts(df, "text", k = 10)
      .as[(String, Long)].collect()
    assert(got.toSeq == Seq(("ab", 2L), ("ba", 1L)))
  }

  test("temperatureWeights: alpha=1 is the natural mixture; alpha<1 flattens") {
    val df = Seq(
      (1L, "en", "a b c d e f g h"),  // 8 tokens
      (2L, "de", "x y")               // 2 tokens
    ).toDF("doc_id", "lang", "text")
    val t = graft.functions.TextFns.tokenCount(col("text"))
    // alpha = 1: target == natural share, every weight exactly 1
    val id = Curation.temperatureWeights(df, "lang", t, alpha = 1.0)
      .orderBy("lang").collect()
    id.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4), "alpha=1 must keep shares")
      assert(r.getDouble(5) == 1.0)
    }
    // alpha = 0.5: minority stratum up-weighted, majority down-weighted
    val half = Curation.temperatureWeights(df, "lang", t, alpha = 0.5)
      .orderBy("lang").collect()
    val (de, en) = (half(0), half(1))
    assert(de.getDouble(4) > de.getDouble(3), "minority share must rise")
    assert(en.getDouble(4) < en.getDouble(3), "majority share must fall")
    assert(de.getDouble(5) > 1.0 && en.getDouble(5) < 1.0)
  }

  // --------------------------------------------------------------- bpeTrain

  test("bpeTrain: two rounds of count-best-fuse reach the expected vocab") {
    val df = Seq((1L, "aa ab"), (2L, "aa")).toDF("id", "text")
    // census: aa×2 → [a,a], ab×1 → [a,b]
    // round 1: pairs "a a"×2, "a b"×1 → fuse (a,a): aa→[aa]
    // round 2: pairs "a b"×1 → fuse (a,b): ab→[ab]
    val got = Curation.bpeTrain(df, "text", merges = 2)
      .orderBy("symbol").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("aa", 2L), ("ab", 1L)))
    // zero merges = plain char census; 1-char words keep their symbol
    val chars = Curation.bpeTrain(Seq((1L, "ab a")).toDF("id", "text"),
        "text", merges = 0)
      .orderBy("symbol").as[(String, Long)].collect()
    assert(chars.toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  // ---------------------------------------------------------- unigram-LM

  test("unigramLmTrain: chars always survive, shrink schedule, probs sane") {
    val docs = Seq((1L, "hello world spark spark"),
      (2L, "hello spark streams world today")).toDF("doc_id", "text")
    val got = Curation.unigramLmTrain(docs, "text", rounds = 2,
        vocabTarget = 4, maxPieceLen = 3, seedSize = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val chars = docs.select(explode(split(col("text"), " ")).as("w"))
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect().toSet
    val pieces = got.map(_._1).toSet
    // every single character of the corpus survives every prune
    assert(chars.subsetOf(pieces), s"missing chars: ${chars -- pieces}")
    // multi budget follows the 3/4-shrink schedule: seed 16 → 12 → 9
    assert(got.count(_._1.length > 1) == 9, s"got $got")
    // probabilities are positive, ≤ 1, and ~normalized over the vocab
    assert(got.forall(t => t._3 > 0.0 && t._3 <= 1.0))
    val psum = got.map(_._3).sum
    assert(math.abs(psum - 1.0) < 0.01, s"prob mass $psum")
    // deterministic under repartition
    val again = Curation.unigramLmTrain(docs.repartition(7), "text",
        rounds = 2, vocabTarget = 4, maxPieceLen = 3, seedSize = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("unigramEncode: Viterbi pieces reassemble words, bpeEncode join shape") {
    val docs = Seq((1L, "hello world spark"),
      (2L, "hello spark spark streams")).toDF("doc_id", "text")
    val vocab = Curation.unigramLmTrain(docs, "text", rounds = 1,
        vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
      .select("piece").as[String].collect().toSet
    val enc = Curation.unigramEncode(docs, "doc_id", "text", rounds = 1,
      vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
    // output contract parity with the BPE encoder (same join shape:
    // token stream ⨝ per-word segmentation on the word key)
    val bpe = Curation.bpeEncode(docs, "doc_id", "text", merges = 1)
    assert(enc.schema.map(f => (f.name, f.dataType)) ==
      bpe.schema.map(f => (f.name, f.dataType)))
    val rows = enc.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // every emitted symbol is a trained piece
    assert(rows.forall(r => vocab.contains(r._4)),
      s"unknown pieces: ${rows.filter(r => !vocab.contains(r._4)).toSeq}")
    // symbols reassemble each word in (word_pos, sym_pos) order
    val byWord = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.sortBy(_._3).map(_._4).mkString }
    val want = Map(
      (1L, 0L) -> "hello", (1L, 1L) -> "world", (1L, 2L) -> "spark",
      (2L, 0L) -> "hello", (2L, 1L) -> "spark", (2L, 2L) -> "spark",
      (2L, 3L) -> "streams")
    assert(byWord == want, s"got $byWord")
  }

  test("unigramSampleEncode: reassembly, in-vocab, per-occurrence, salt") {
    val docs = Seq((1L, "hello world spark"),
      (2L, "hello spark spark streams"),
      (3L, "spark spark spark spark hello hello")).toDF("doc_id", "text")
    val vocab = Curation.unigramLmTrain(docs, "text", rounds = 1,
        vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
      .select("piece").as[String].collect().toSet
    val enc = Curation.unigramSampleEncode(docs, "doc_id", "text",
      rounds = 1, vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
    // same output contract as the Viterbi encoder
    val vit = Curation.unigramEncode(docs, "doc_id", "text", rounds = 1,
      vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
    assert(enc.schema.map(f => (f.name, f.dataType)) ==
      vit.schema.map(f => (f.name, f.dataType)))
    val rows = enc.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // every sampled symbol is a trained piece
    assert(rows.forall(r => vocab.contains(r._4)),
      s"unknown pieces: ${rows.filter(r => !vocab.contains(r._4)).toSeq}")
    // symbols reassemble each word occurrence in sym_pos order
    val docWords = docs.as[(Long, String)].collect().flatMap {
      case (id, text) => text.split(" ").zipWithIndex.map {
        case (w, p) => (id, p.toLong) -> w
      }
    }.toMap
    val byOcc = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      k -> rs.sortBy(_._3).map(_._4).mkString }
    assert(byOcc == docWords, s"got $byOcc, want $docWords")
    // the point of subword regularization: the SAME word segments
    // differently across occurrences (the draw is per occurrence)
    val segsPerWord = rows.groupBy(r => (r._1, r._2)).toSeq
      .groupBy { case ((id, p), _) => docWords((id, p)) }
      .map { case (w, occs) =>
        w -> occs.map(_._2.sortBy(_._3).map(_._4).toSeq).distinct.size }
    assert(segsPerWord.values.max > 1,
      s"no word sampled two distinct segmentations: $segsPerWord")
    // deterministic under repartition: the draw is a pure function of
    // (id, word_pos, salt)
    val again = Curation.unigramSampleEncode(docs.repartition(7), "doc_id",
        "text", rounds = 1, vocabTarget = 8, maxPieceLen = 3, seedSize = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(again.sortBy(t => (t._1, t._2, t._3)).toSeq ==
      rows.sortBy(t => (t._1, t._2, t._3)).toSeq)
    // a different salt redraws at least one occurrence
    val salted = Curation.unigramSampleEncode(docs, "doc_id", "text",
        rounds = 1, vocabTarget = 8, maxPieceLen = 3, seedSize = 16,
        salt = "unisamp-b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(salted.sortBy(t => (t._1, t._2, t._3)).toSeq !=
      rows.sortBy(t => (t._1, t._2, t._3)).toSeq)
  }

  test("unigramEncodeRowwise: bit-parity with the join encoder; OOV; stream") {
    val docs = Seq((1L, "hello world spark"),
      (2L, "hello spark spark streams"),
      (3L, "worlds apart sparkle")).toDF("doc_id", "text")
    val vocabF = Curation.unigramLmTrain(docs, "text", rounds = 2,
      vocabTarget = 8, maxPieceLen = 3, seedSize = 16).localCheckpoint()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_pos", "sym_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val joined = canon(Curation.unigramEncodeFromSegments(docs, "doc_id",
      "text", Curation.unigramSegmentedFromVocab(docs, "text", vocabF, 3)))
    val rowwise = canon(Curation.unigramEncodeRowwiseFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    assert(rowwise.nonEmpty && rowwise == joined)
    // OOV fallback: a word with a character the vocab never saw comes
    // back whole (the explicit UNK convention), in-vocab words segment
    val novel = Seq((9L, "hello zzz@qq")).toDF("doc_id", "text")
    val got = canon(Curation.unigramEncodeRowwiseFromVocab(novel,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    assert(got.filter(_._2 == 1L).map(_._4) == Seq("zzz@qq"), s"got $got")
    assert(got.filter(_._2 == 0L).map(_._4).mkString == "hello")
    // stream-safe by construction: the same narrow projection over
    // micro-batches emits exactly the batch rows
    implicit val ctx = sess.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val enc = Curation.unigramEncodeRowwiseFromVocab(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", vocabF,
      maxPieceLen = 3)
    val q = enc.writeStream.format("memory")
      .queryName("graft_uni_rowwise_stream").outputMode("append").start()
    try {
      in.addData((1L, "hello world spark"))
      q.processAllAvailable()
      in.addData((2L, "hello spark spark streams"), (3L, "worlds apart sparkle"))
      q.processAllAvailable()
      val streamed = canon(spark.table("graft_uni_rowwise_stream"))
      assert(streamed == joined)
    } finally q.stop()
  }

  test("wordPieceEncodeRowwise: maximal munch, differs from Viterbi, OOV, stream") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_pos", "sym_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    // forced fixture: greedy commits to the longest prefix ("abc"+"d")
    // while Viterbi under these probabilities prefers the finer
    // high-probability split ("ab"+"cd") — the rules genuinely differ
    val vocabFix = Seq(
      ("abc", 1.0, 0.000001), ("ab", 1.0, 0.4), ("cd", 1.0, 0.4),
      ("a", 1.0, 0.05), ("b", 1.0, 0.05), ("c", 1.0, 0.05),
      ("d", 1.0, 0.05)).toDF("piece", "cnt", "prob")
    val fix = Seq((1L, "abcd")).toDF("doc_id", "text")
    val greedy = canon(Curation.wordPieceEncodeRowwiseFromVocab(
      fix, "doc_id", "text", vocabFix, maxPieceLen = 3))
    assert(greedy.map(_._4) == Seq("abc", "d"), s"got $greedy")
    val viterbi = canon(Curation.unigramEncodeRowwiseFromVocab(
      fix, "doc_id", "text", vocabFix, maxPieceLen = 3))
    assert(viterbi.map(_._4) == Seq("ab", "cd"), s"got $viterbi")
    // real-vocab properties: reassembly per word, symbols in the piece
    // set, and the greedy output differs from Viterbi somewhere
    val docs = Seq((1L, "hello world spark"),
      (2L, "hello spark spark streams"),
      (3L, "worlds apart sparkle")).toDF("doc_id", "text")
    val vocabF = Curation.unigramLmTrain(docs, "text", rounds = 2,
      vocabTarget = 8, maxPieceLen = 3, seedSize = 16).localCheckpoint()
    val pieces = vocabF.select("piece").collect().map(_.getString(0)).toSet
    val got = canon(Curation.wordPieceEncodeRowwiseFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    assert(got.nonEmpty && got.forall(r => pieces.contains(r._4)))
    val words = docs.as[(Long, String)].collect()
      .flatMap { case (id, t) => t.split(" ").zipWithIndex.map {
        case (w, i) => (id, i.toLong) -> w } }.toMap
    got.groupBy(r => (r._1, r._2)).foreach { case (k, rs) =>
      assert(rs.sortBy(_._3).map(_._4).mkString == words(k),
        s"reassembly failed for $k") }
    // OOV fallback: stranded walk emits the whole word
    val novel = Seq((9L, "hello zzz@qq")).toDF("doc_id", "text")
    val nv = canon(Curation.wordPieceEncodeRowwiseFromVocab(novel,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    assert(nv.filter(_._2 == 1L).map(_._4) == Seq("zzz@qq"), s"got $nv")
    // stream-safe: micro-batches emit exactly the batch rows
    implicit val ctx = sess.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val enc = Curation.wordPieceEncodeRowwiseFromVocab(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", vocabF,
      maxPieceLen = 3)
    val q = enc.writeStream.format("memory")
      .queryName("graft_wp_stream").outputMode("append").start()
    try {
      in.addData((1L, "hello world spark"))
      q.processAllAvailable()
      in.addData((2L, "hello spark spark streams"), (3L, "worlds apart sparkle"))
      q.processAllAvailable()
      assert(canon(spark.table("graft_wp_stream")) == got)
    } finally q.stop()
  }

  test("wordPiece two-alphabet: ## continuation, derived split, UNK strand") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_pos", "sym_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    // forced fixture: 'x' occurs ONLY word-initially in the corpus, so
    // it must land in the initial alphabet alone; 'b' occurs only at
    // inner positions, so continuation alone; 'a' both ways
    val corpus = Seq((1L, "xa ab aa"), (2L, "xab")).toDF("doc_id", "text")
    val vocabFix = Seq(("x", 1.0), ("a", 1.0), ("b", 1.0), ("ab", 1.0))
      .toDF("piece", "prob")
    val alpha = Curation.wordPieceAlphabets(corpus, "text", vocabFix)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(alpha("x") == ((true, false)), s"got $alpha")  // initial only
    assert(alpha("b") == ((false, true)), s"got $alpha")  // inner only
    assert(alpha("a") == ((true, true)), s"got $alpha")
    assert(alpha("ab") == ((true, true)), s"got $alpha")  // 'ab' word + 'xab'
    // the walk: position 0 from the initial set raw, later positions
    // ##-prefixed from the continuation set
    val alphaF = Curation.wordPieceAlphabets(corpus, "text", vocabFix)
    val got = canon(Curation.wordPieceEncodeRowwiseFromAlphabets(
      corpus, "doc_id", "text", alphaF, maxPieceLen = 2))
    val byWord = got.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.sortBy(_._3).map(_._4).toList }
    assert(byWord((1L, 0L)) == List("x", "##a"), s"got $byWord")
    assert(byWord((1L, 1L)) == List("ab"), s"got $byWord")      // maximal munch at pos 0
    assert(byWord((2L, 0L)) == List("x", "##ab"), s"got $byWord")
    // UNK strand: 'x' has no continuation entry, so an inner x strands
    // the walk and the WHOLE word falls back raw — the published rule
    val strander = Seq((9L, "ax")).toDF("doc_id", "text")
    val nv = canon(Curation.wordPieceEncodeRowwiseFromAlphabets(
      strander, "doc_id", "text", alphaF, maxPieceLen = 2))
    assert(nv.map(_._4) == Seq("ax"), s"got $nv")
    // single-alphabet mode is untouched: same fixture through the
    // no-## entry point segments 'ax' fine
    val legacy = canon(Curation.wordPieceEncodeRowwiseFromVocab(
      strander, "doc_id", "text", vocabFix, maxPieceLen = 2))
    assert(legacy.map(_._4) == Seq("a", "x"), s"got $legacy")
    // EMPTY derived continuation alphabet (round-17 ADVICE): the mode is
    // the entry point's, not inferred from contPieces.nonEmpty — every
    // inner position strands, so every multi-piece word falls back whole
    // instead of silently re-segmenting single-alphabet
    val emptyCont = alphaF.withColumn("continuation", lit(false))
    val ec = canon(Curation.wordPieceEncodeRowwiseFromAlphabets(
      corpus, "doc_id", "text", emptyCont, maxPieceLen = 2))
    val ecByWord = ec.groupBy(r => (r._1, r._2))
      .map { case (k, rs) => k -> rs.sortBy(_._3).map(_._4).toList }
    assert(ecByWord((1L, 0L)) == List("xa"), s"got $ecByWord") // strands
    assert(ecByWord((1L, 2L)) == List("aa"), s"got $ecByWord") // strands
    assert(ecByWord((1L, 1L)) == List("ab"), s"got $ecByWord") // one piece
  }

  test("unigramSampleEncodeRowwise: bit-parity with declarative; stream") {
    val docs = Seq((1L, "hello world spark"),
      (2L, "hello spark spark streams"),
      (3L, "spark spark spark spark hello hello")).toDF("doc_id", "text")
    val vocabF = Curation.unigramLmTrain(docs, "text", rounds = 1,
      vocabTarget = 8, maxPieceLen = 3, seedSize = 16).localCheckpoint()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_pos", "sym_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val declarative = canon(Curation.unigramSampleEncodeFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    val rowwise = canon(Curation.unigramSampleEncodeRowwiseFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3))
    assert(rowwise.nonEmpty && rowwise == declarative)
    // the kernel honors the salt exactly like the declarative draw
    val saltD = canon(Curation.unigramSampleEncodeFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3, salt = "unisamp-b"))
    val saltR = canon(Curation.unigramSampleEncodeRowwiseFromVocab(docs,
      "doc_id", "text", vocabF, maxPieceLen = 3, salt = "unisamp-b"))
    assert(saltR == saltD && saltR != rowwise)
    // stream-safe: micro-batches emit exactly the batch rows
    implicit val ctx = sess.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val enc = Curation.unigramSampleEncodeRowwiseFromVocab(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", vocabF,
      maxPieceLen = 3)
    val q = enc.writeStream.format("memory")
      .queryName("graft_uni_sample_stream").outputMode("append").start()
    try {
      in.addData((1L, "hello world spark"))
      q.processAllAvailable()
      in.addData((2L, "hello spark spark streams"),
        (3L, "spark spark spark spark hello hello"))
      q.processAllAvailable()
      assert(canon(spark.table("graft_uni_sample_stream")) == declarative)
    } finally q.stop()
  }

  test("bpeEncodeRowwise: parity with the join encoder; merge model streams") {
    val docs = Seq((1L, "aa ab aa"), (2L, "abab aa ba")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "word_pos", "sym_pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSeq
    val joined = canon(Curation.bpeEncode(docs, "doc_id", "text", merges = 3))
    val rowwise = canon(Curation.bpeEncodeRowwise(docs, "doc_id", "text",
      merges = 3))
    assert(rowwise.nonEmpty && rowwise == joined)
    // the trained merge model replays over a stream (train on the batch
    // corpus, encode micro-batches with the plan-constant chain)
    val mergeSeq = Curation.bpeTrainLoop(docs, "text", merges = 3)._2
    assert(mergeSeq.nonEmpty)
    implicit val ctx = sess.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val enc = Curation.bpeEncodeRowwiseFromMerges(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", mergeSeq)
    val q = enc.writeStream.format("memory")
      .queryName("graft_bpe_rowwise_stream").outputMode("append").start()
    try {
      in.addData((1L, "aa ab aa"))
      q.processAllAvailable()
      in.addData((2L, "abab aa ba"))
      q.processAllAvailable()
      assert(canon(spark.table("graft_bpe_rowwise_stream")) == joined)
    } finally q.stop()
  }

  test("bpeTrain batched: disjoint batches match sequential; overlaps skip") {
    // two independent pair families — (a,a) in aa-words, (b,c) in
    // bc-words — are symbol-disjoint, so one batch=2 round must land
    // exactly where two sequential rounds do
    val disjoint = Seq((1L, "aa aa bc"), (2L, "bc aa")).toDF("id", "text")
    val seqVocab = Curation.bpeTrain(disjoint, "text", merges = 2)
      .orderBy("symbol").as[(String, Long)].collect().toSeq
    val batVocab = Curation.bpeTrain(disjoint, "text", merges = 2, batch = 2)
      .orderBy("symbol").as[(String, Long)].collect().toSeq
    assert(batVocab == seqVocab)
    assert(seqVocab.map(_._1).toSet == Set("aa", "bc"))
    // overlapping candidates: census of "aaa"-heavy corpus ranks
    // (a,a) first and (aa,a) doesn't exist yet; the #2 pair (a,b)
    // shares symbol a → skipped within the batch, fused next round.
    // batch=2 over merges=2 must still complete both merges and emit a
    // valid segmentation (symbols reconstruct each word, counts
    // conserved) even when a batch can't fill.
    val overlap = Seq((1L, "aaab aaab ab")).toDF("id", "text")
    val words = Curation.bpeWordSymbols(overlap, "text", merges = 3, batch = 2)
      .as[(String, Seq[String], Long)].collect()
    words.foreach { case (w, syms, _) => assert(syms.mkString == w) }
    assert(words.map(_._3).sum == 3L)
    // batch=1 path unchanged by the batched rewrite (the graded config)
    val b1 = Curation.bpeTrain(disjoint, "text", merges = 2, batch = 1)
      .orderBy("symbol").as[(String, Long)].collect().toSeq
    assert(b1 == seqVocab)
  }

  test("bpeFertility: symbols-per-word and chars-per-symbol per stratum") {
    // after 1 merge on this corpus: pairs "a a"×3 (from aa×2, aaa has
    // two but counts once per position: [a,a,a] → "a a"×2·1)...
    // keep it simpler: 2 merges over the bpeTrain fixture, strata split
    val df = Seq(("s1", "aa ab"), ("s2", "aa")).toDF("source", "text")
    // trained as in the bpeTrain test: aa → [aa], ab → [ab]
    val got = Curation.bpeFertility(df, "source", "text", merges = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    // s1: words aa, ab → 2 words, 2 symbols, 4 chars → fert 1.0, cps 2.0
    // s2: word aa → 1 word, 1 symbol, 2 chars → fert 1.0, cps 2.0
    assert(got.toSeq == Seq(("s1", 2L, 2L, 4L, 1.0, 2.0),
      ("s2", 1L, 1L, 2L, 1.0, 2.0)))
    // zero merges: every char is a symbol → fertility = chars per word
    val raw = Curation.bpeFertility(df, "source", "text", merges = 0)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(raw.toSeq == Seq(("s1", 2L, 4L, 4L, 2.0, 1.0),
      ("s2", 1L, 2L, 2L, 2.0, 1.0)))
  }

  test("bpeEncode segments document tokens with the trained merges") {
    val df = Seq((1L, "aa ab"), (2L, "aa")).toDF("id", "text")
    // after 2 merges (see the bpeTrain test): aa → [aa], ab → [ab]
    val got = Curation.bpeEncode(df, "id", "text", merges = 2)
      .orderBy("id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, "aa"), (1L, 1L, 0L, "ab"), (2L, 0L, 0L, "aa")))
    // zero merges: plain character segmentation in document order
    val chars = Curation.bpeEncode(Seq((1L, "ab a")).toDF("id", "text"),
        "id", "text", merges = 0)
      .orderBy("id", "word_pos", "sym_pos")
      .as[(Long, Long, Long, String)].collect()
    assert(chars.toSeq == Seq(
      (1L, 0L, 0L, "a"), (1L, 0L, 1L, "b"), (1L, 1L, 0L, "a")))
  }

  test("BpeMergePair fuses left-to-right without overlap") {
    val got = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(graft.expressions.BpeMergePair(col("syms"), "a", "a"))
      .as[Seq[String]].collect().head
    assert(got == Seq("aa", "a"))
    val multi = Seq(Tuple1(Seq("x", "a", "b", "a", "b"))).toDF("syms")
      .select(graft.expressions.BpeMergePair(col("syms"), "a", "b"))
      .as[Seq[String]].collect().head
    assert(multi == Seq("x", "ab", "ab"))
  }

  // ------------------------------------------------------ perplexityBuckets

  test("perplexityBuckets: per-stratum rank terciles over cross-entropy") {
    // en docs engineered to three distinct cross-entropy levels: a doc of
    // one common word (low surprise), mixed, and one of a rare word
    // (high surprise); de has a single doc → bucket 1
    val df = Seq(
      (1L, "en", "the the the the"),
      (2L, "en", "the rare the cat"),
      (3L, "en", "zzz qqq vvv www"),
      (4L, "de", "und und")
    ).toDF("doc_id", "lang", "text")
    val got = Curation.perplexityBuckets(df, "doc_id", "text", "lang",
        nBuckets = 3)
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, "en", 1L), (2L, "en", 2L), (3L, "en", 3L), (4L, "de", 1L)))
    // en buckets follow the cross-entropy order: common-word doc is the
    // most stereotypical (head), all-rare doc the most surprising (tail)
  }

  // --------------------------------------------------- fail-fast contracts

  test("round-7 operators fail fast on column collisions and bad params") {
    val df = Seq((1L, "a b", "en", 2)).toDF("id", "text", "lang", "n")
    intercept[IllegalArgumentException] {
      Curation.shardAssign(df.withColumn("shard", lit(0)), "id", 4)
    }
    intercept[IllegalArgumentException] {
      Curation.shardAssign(df, "id", 0)
    }
    intercept[IllegalArgumentException] {
      Curation.budgetedSelection(df, "id", "lang", col("n"), col("n"), 0L)
    }
    intercept[IllegalArgumentException] {
      Curation.budgetedSelection(df.withColumnRenamed("lang", "keep"),
        "id", "keep", col("n"), col("n"), 10L)
    }
    intercept[IllegalArgumentException] {
      Curation.curationPass(df.withColumn("keep", lit(1L)), df,
        "id", "text", Seq("r" -> (col("n_tokens") < 1)))
    }
    intercept[IllegalArgumentException] {
      Dedup.deltaDedup(df, df, "status", col("text"))
    }
    intercept[IllegalArgumentException] {
      Curation.bpePairCounts(df, "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.topKBatch(df, "id", "text", df, "id", k = 0)
    }
  }

  // ------------------------------------------- batched top-k + recall eval

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("topKBatch equals per-query topK for every query") {
    val queries = vecs.filter(col("vec_id") < 2)
    val batch = Similarity.topKBatch(vecs, "vec_id", "embedding",
        queries, "vec_id", k = 3)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for (qid <- Seq(0L, 1L)) {
      val single = Similarity.topK(vecs, "vec_id", "embedding",
          vecs.filter(col("vec_id") === qid), k = 3)
        .as[(Long, Double)].collect().toSet
      assert(batch(qid) == single, s"query $qid mismatch")
    }
  }

  test("ivfTopKBatch equals per-query ivfTopK on real embeddings") {
    val corpus = graft.sources.Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 2)
    val batch = Similarity.ivfTopKBatch(corpus, "vec_id", "embedding",
        queries, "vec_id", k = 5)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for (qid <- Seq(0L, 1L)) {
      val single = Similarity.ivfTopK(corpus, "vec_id", "embedding",
          corpus.filter(col("vec_id") === qid), k = 5)
        .as[(Long, Double)].collect().toSet
      assert(batch(qid) == single, s"query $qid mismatch")
      assert(batch(qid).contains((qid, 1.0))) // self in own best cell
    }
  }

  test("recallAtK: identical frames score 1.0, disjoint score 0.0") {
    val exact = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("query_id", "vec_id")
    val same = Similarity.recallAtK(exact, exact, "query_id", "vec_id")
      .orderBy("query_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(same.toSeq == Seq((0L, 2L, 2L, 1.0), (1L, 1L, 1L, 1.0)))
    val disjoint = Seq((0L, 9L), (1L, 9L)).toDF("query_id", "vec_id")
    val zero = Similarity.recallAtK(exact, disjoint, "query_id", "vec_id")
      .orderBy("query_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(zero.toSeq == Seq((0L, 2L, 0L, 0.0), (1L, 1L, 0L, 0.0)))
  }

  test("lshTopKBatch equals per-query lshTopK on real-width vectors") {
    // 64-dim like the embeddings table, so the plane signatures are
    // genuine; batch results must match the single-query path per query
    val rnd = new scala.util.Random(23)
    def randVec() = Array.fill(64)((rnd.nextDouble() - 0.5).toFloat)
    def perturb(v: Array[Float]) =
      v.map(x => x + (rnd.nextDouble() * 0.06 - 0.03).toFloat)
    val base = randVec()
    val rows = Seq((0L, base)) ++ (1L to 4L).map(i => (i, perturb(base))) ++
      (5L to 99L).map(i => (i, randVec()))
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 2)
    val batch = Similarity.lshTopKBatch(df, "vec_id", "embedding",
        queries, "vec_id", k = 5)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for (qid <- Seq(0L, 1L)) {
      val single = Similarity.lshTopK(df, "vec_id", "embedding",
          df.filter(col("vec_id") === qid), k = 5)
        .as[(Long, Double)].collect().toSet
      assert(batch(qid) == single, s"query $qid mismatch")
      // self always shares every band with itself → top hit at cos 1.0
      assert(batch(qid).contains((qid, 1.0)))
    }
  }

  test("round-8 operators fail fast on bad params") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    val emb = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Curation.dsirWeights(df, df, "doc_id", "text", buckets = 0)
    }
    intercept[IllegalArgumentException] {
      Curation.dsirSelect(df.withColumn("dsir_logw", lit(0.0)), "doc_id", k = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.semDedup(emb, "vec_id", "embedding", threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sketch.countMin(df, "text", depth = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Sketch.cmsEstimate(df, df, "text", width = 0)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Bm25.topK(df, "doc_id", "text", df, "doc_id", "text",
        k = 5, b = 1.5)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Fusion.rrf(Seq.empty, "q", "id", "s", k = 5)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Fusion.rrf(Seq(df), "doc_id", "text", "s", k = 0)
    }
  }

  // ------------------------------------------------------- span corruption

  test("spanCorrupt: sentinel substitution reconstructs the original text") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 40)
    val out = Curation.spanCorrupt(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"), col("input_text"), col("target_text"), col("text"))
      .as[(Long, Long, Long, Long, String, String, String)].collect()
    assert(out.length == 40)
    val sentinel = "<extra_id_(\\d+)>".r
    out.foreach { case (id, nt, nm, ns, input, target, text) =>
      assert(nm <= nt && ns <= nm, s"doc $id count invariants")
      // target = <extra_id_0> span0 <extra_id_1> span1 ... <extra_id_ns>
      val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(ids == (0L.to(ns).map(_.toInt)), s"doc $id sentinel order")
      val spans = sentinel.split(target).map(_.trim).filter(_.nonEmpty)
      assert(spans.length == ns, s"doc $id span count")
      // substitute spans back into the input -> original document
      val rebuilt = sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(spans(m.group(1).toInt)))
      assert(rebuilt == text, s"doc $id reconstruction")
    }
    // deterministic across invocations (pure function of ids + salt)
    val again = Curation.spanCorrupt(docs, "doc_id", "text")
      .select(col("doc_id"), col("input_text"))
      .as[(Long, String)].collect().toMap
    out.foreach { case (id, _, _, _, input, _, _) =>
      assert(again(id) == input)
    }
  }

  // ----------------------------------------------------------- RRF fusion

  test("Fusion.rrf: hand-computed fused ranking over two systems") {
    // system A ranks (1,2,3); system B ranks (2,3,4) — doc 2 fuses best
    val a = Seq((7L, 1L, 0.9), (7L, 2L, 0.8), (7L, 3L, 0.7))
      .toDF("query_id", "vec_id", "cos_sim")
    val b = Seq((7L, 2L, 0.95), (7L, 3L, 0.85), (7L, 4L, 0.75))
      .toDF("query_id", "vec_id", "cos_sim")
    val got = graft.operators.Fusion.rrf(Seq(a, b),
        "query_id", "vec_id", "cos_sim", k = 4)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = Seq(
      (7L, 2L, r6(1.0 / 62 + 1.0 / 61)), // rank 2 in A, rank 1 in B
      (7L, 3L, r6(1.0 / 63 + 1.0 / 62)), // rank 3 in A, rank 2 in B
      (7L, 1L, r6(1.0 / 61)),            // A only, rank 1
      (7L, 4L, r6(1.0 / 63)))            // B only, rank 3
    assert(got.toSeq == exp.zipWithIndex.map { case ((q, v, s), i) =>
      (q, v, (i + 1).toLong, s) })
  }

  // ---------------------------------------------------------------- BM25

  test("Bm25.topK: hand-computed ranking, unmatched docs absent") {
    val corpus = Seq(
      (10L, "apple banana apple"),        // dl 3, apple tf 2
      (11L, "banana cherry"),             // no query term
      (12L, "cherry cherry cherry date")  // dl 4, date tf 1
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "apple date")).toDF("doc_id", "text")
    val got = graft.functions.Bm25.topK(corpus, "doc_id", "text",
        queries, "doc_id", "text", k = 5)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect()
    // N = 3, avgdl = 3; df(apple) = df(date) = 1 → idf = ln(1 + 2.5/1.5)
    val idf = math.log(1.0 + 2.5 / 1.5)
    val d10 = BigDecimal(idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d12 = BigDecimal(idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 4 / 3.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 10L, 1L, d10), (1L, 12L, 2L, d12)))
  }

  // ------------------------------------------------------------ SemDeDup

  test("semDedup: within-cell dups cluster; least centroid-like member kept") {
    // seeds (nCells = 2) are ids 1 and 2 → cells [1,0] and [0,1];
    // 3 and 4 sit near cell 1's centroid and near each other, 5 is a
    // cell-2 loner
    val df = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.95f, 0.05f)),
      (5L, Array(-0.7f, 0.72f))).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = 0.95, nCells = 2)
      .orderBy("vec_id")
      .select(col("vec_id"), col("cell"), col("cluster"), col("keep"))
      .as[(Long, Long, Long, Long)].collect()
    // cell 1 = {1,3,4}: all pairwise cos >= 0.95 → one cluster labeled
    // by its min id; the representative is 3 (lowest centroid cosine —
    // 1 IS the centroid at cos 1.0, 4 is nearer to it than 3)
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 0L),
      (2L, 2L, 2L, 1L),
      (3L, 1L, 1L, 1L),
      (4L, 1L, 1L, 0L),
      (5L, 2L, 5L, 1L)))
  }

  // ---------------------------------------------------------------- DSIR

  test("dsirWeights: target-like docs outscore off-target; short docs at 0") {
    val target = Seq(
      (100L, "alpha beta gamma delta alpha beta"),
      (101L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta gamma delta"),    // every bigram in the target
      (2L, "zeta eta theta iota kappa"), // no bigram in the target
      (3L, "one")                        // < 2 tokens: no features
    ).toDF("doc_id", "text")
    val got = Curation.dsirWeights(raw, target, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq == Seq((1L, 3L), (2L, 4L), (3L, 0L)))
    // target-covered grams carry positive log-ratios, unseen grams
    // negative ones (add-1 smoothing): the orderings are structural
    assert(got(0)._3 > 0.0 && got(1)._3 < 0.0)
    assert(got(2)._3 == 0.0)
  }

  test("dsirWeights emits every non-null-text doc once, n_feats = bigrams") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 60)
    val w = Curation.dsirWeights(docs,
      docs.filter(col("source") === "src0"), "doc_id", "text")
    val expected = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        greatest(size(TextFns.tokens(col("text"))) - 1, lit(0)).cast("long")
          .as("nb"))
    val joined = w.join(expected, "doc_id")
      .select(col("n_feats"), col("nb")).as[(Long, Long)].collect()
    assert(joined.length == expected.count().toInt)
    joined.foreach { case (nf, nb) => assert(nf == nb) }
  }

  test("dsirScoreRowwise agrees with the batch path on real docs") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 60)
    val target = docs.filter(col("source") === "src0")
    val batch = Curation.dsirWeights(docs, target, "doc_id", "text")
    val twin = Curation.dsirScoreRowwise(docs, docs, target, "doc_id", "text")
    val joined = batch.join(
        twin.withColumnRenamed("n_feats", "nf2")
          .withColumnRenamed("dsir_logw", "w2"), "doc_id")
      .select(col("n_feats"), col("nf2"), col("dsir_logw"), col("w2"))
      .as[(Long, Long, Double, Double)].collect()
    assert(joined.length == docs.filter(col("text").isNotNull).count().toInt)
    joined.foreach { case (nf, nf2, w1, w2) =>
      assert(nf == nf2)
      // same lambda values summed in different association — the two
      // rounded results can differ by at most one ulp-step at round-6
      assert(math.abs(w1 - w2) <= 2e-6, s"$w1 vs $w2")
    }
  }

  test("dsirSelect: k rows, deterministic, dominated by strong weights") {
    val weights = ((1L, 1000.0) +: (2L to 50L).map(i => (i, 0.0)))
      .toDF("doc_id", "dsir_logw")
      .withColumn("n_feats", lit(10L))
    val a = Curation.dsirSelect(weights, "doc_id", k = 5)
      .orderBy("doc_id").as[(Long, Double, Long, Double)].collect()
    val b = Curation.dsirSelect(weights, "doc_id", k = 5)
      .orderBy("doc_id").as[(Long, Double, Long, Double)].collect()
    assert(a.length == 5)
    assert(a.toSeq == b.toSeq)                  // pure function of ids
    assert(a.exists(_._1 == 1L))                // +1000 log-weight always wins
  }

  // --------------------------------------------------------- sq8TopKBatch

  test("sq8TopKBatch: 0/1 vectors round-trip exactly, self is top-1") {
    // values 0 and 1 quantize to codes 0 and 255 and reconstruct
    // EXACTLY, so the SQ8 scores equal the float scores bit-for-bit
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(0f, 0f, 1f, 1f)),
      (3L, Seq(1f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.sq8TopKBatch(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") < 2), "vec_id", k = 2)
      .as[(Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._3).toSeq).toMap
    assert(got(0L).head == ((0L, 0L, 1.0)))     // self at cos exactly 1
    assert(got(1L).head == ((1L, 1L, 1.0)))
    assert(got(0L)(1)._2 == 3L)                 // shared-axis neighbor next
  }

  test("sq8TopKBatch handles constant dimensions and full recall here") {
    // dim 2 constant across the corpus (mx == mn) must not divide by 0
    val corpus = Seq(
      (0L, Seq(0.9f, 0.1f, 5f)),
      (1L, Seq(0.1f, 0.9f, 5f)),
      (2L, Seq(0.85f, 0.2f, 5f)),
      (3L, Seq(0.15f, 0.8f, 5f))
    ).toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") < 2)
    val exact = Similarity.topKBatch(corpus, "vec_id", "embedding",
      qs, "vec_id", k = 2)
    val sq8 = Similarity.sq8TopKBatch(corpus, "vec_id", "embedding",
      qs, "vec_id", k = 2)
    val rec = Similarity.recallAtK(exact, sq8, "query_id", "vec_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(rec.length == 2)
    rec.foreach { case (_, nExact, nHit, recall) =>
      assert(nExact == 2L && nHit == 2L && recall == 1.0)
    }
  }

  // -------------------------------------------------------- cdcChunkStats

  test("cdcChunkStats: exact copy is all-dup; a shifted copy realigns") {
    val base = (1 to 60).map(i => s"w${i * 7 % 23}x$i").mkString(" ")
    val docs = Seq(
      (1L, base),            // original: owns every chunk
      (2L, "zzz " + base),   // shifted: every chunk after break 1 realigns
      (3L, base)             // exact copy: every chunk is a duplicate
    ).toDF("doc_id", "text")
    val got = Dedup.cdcChunkStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val Array(a, b, c) = got
    assert(a._4 == 0L && a._6 == 0.0)           // original owns its chunks
    // CDC guarantee: boundaries depend only on content, so the copy with
    // one token prepended shares every chunk except its first
    assert(b._4 == b._2 - 1)
    assert(c._4 == c._2 && c._6 == 1.0)         // exact copy fully dup
    assert(a._3 == 60L && b._3 == 61L && c._3 == 60L)
  }

  test("exciseDuplicateChunks keeps exactly one copy of every chunk") {
    val base = (1 to 60).map(i => s"w${i * 7 % 23}x$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, "zzz " + base),
      (3L, base)
    ).toDF("doc_id", "text")
    val got = Dedup.exciseDuplicateChunks(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    val Array(a, b, c) = got
    assert(a._3 == 0L && a._4 == base)          // original untouched
    assert(c._3 == c._2 && c._4 == "")          // exact copy fully excised
    // the shifted copy keeps only its first (distinct) chunk
    assert(b._4.startsWith("zzz"))
    assert(b._2 - b._3 == b._4.split(" ").length)
    // census and excision agree on every removed count
    val census = Dedup.cdcChunkStats(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Long, Long, Double)].collect()
    got.zip(census).foreach { case ((_, nt, rm, _), (_, _, nt2, _, dup, _)) =>
      assert(nt == nt2 && rm == dup)
    }
  }

  test("cdcChunkStats token totals partition into chunks") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = Dedup.cdcChunkStats(docs, "doc_id", "text")
    val bad = got.filter(col("dup_tokens") > col("n_tokens") ||
      col("n_dup_chunks") > col("n_chunks")).count()
    assert(bad == 0L)
    val totalToks = got.agg(sum("n_tokens")).as[Long].head()
    val expected = docs.select(sum(TextFns.tokenCount(col("text"))))
      .as[Long].head()
    assert(totalToks == expected)
  }

  // --------------------------------------------------------- rhoSelection

  test("rhoSelection: equal train-CE docs rank by reference coverage") {
    // X and Y have IDENTICAL self-corpus statistics (every term occurs
    // exactly twice corpus-wide), so ce_train(X) == ce_train(Y) and the
    // excess ranking is decided purely by ce_ref: the reference knows
    // alpha/beta (cheap) and has never seen qqq/www (add-1 floor).
    val ref = Seq(
      (100L, "alpha beta alpha beta alpha beta")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta"),                       // covered by the reference
      (2L, "qqq www"),                          // unseen by the reference
      (3L, "alpha beta qqq www")                // balances corpus counts
    ).toDF("doc_id", "text")
    val got = Curation.rhoSelection(corpus, "doc_id", "text", ref, "text",
        m = 5)
      .as[(Long, Long, Double, Double, Double)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._3 == byId(2L)._3)          // identical ce_train
    assert(byId(1L)._4 < byId(2L)._4)           // ref-covered is cheaper
    assert(byId(1L)._5 > byId(2L)._5)           // so its excess ranks higher
    // ce_ref floor check: -(2·ln((0+1)/(6+2)))/2 = ln 8 for the unseen doc
    assert(math.abs(byId(2L)._4 - math.log(8.0)) < 1e-6)
    val top = Curation.rhoSelection(corpus, "doc_id", "text", ref, "text",
      m = 1).as[(Long, Long, Double, Double, Double)].collect()
    assert(top.length == 1 && top.head._1 == 1L)
  }

  // ------------------------------------------------------------ hashEmbed

  test("hashEmbed: unit norm, identical text -> identical vectors") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // same text
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val got = graft.operators.Similarity.hashEmbed(docs, "doc_id", "text")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(1L) == got(2L))
    got.values.foreach { v =>
      assert(v.length == 64)
      val n = v.map(x => x * x).sum
      // rounded-per-element unit norm: 64 dims of round-6 error
      assert(math.abs(n - 1.0) < 1e-4, s"norm^2 $n")
    }
    // identical docs are exact cosine-1 neighbors in hashed space
    val top = graft.operators.Similarity.topKBatch(
        graft.operators.Similarity.hashEmbed(docs, "doc_id", "text"),
        "doc_id", "embedding",
        graft.operators.Similarity.hashEmbed(
          docs.filter(col("doc_id") === 1), "doc_id", "text"),
        "doc_id", k = 2)
      .as[(Long, Long, Double)].collect().sortBy(-_._3)
    assert(top.take(2).map(_._2).toSet == Set(1L, 2L))
    assert(top.take(2).forall(_._3 == 1.0))
  }

  test("hashEmbedRowwise kernel equals the batch aggregate on real docs") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val batch = graft.operators.Similarity.hashEmbed(
        docs, "doc_id", "text")
      .as[(Long, Seq[Double])].collect().toMap
    val row = graft.operators.Similarity.hashEmbedRowwise(
        docs, "doc_id", "text")
      .as[(Long, Seq[Double])].collect().toMap
    assert(row.keySet == batch.keySet)
    row.foreach { case (id, v) => assert(batch(id) == v, s"doc $id") }
  }

  test("hashEmbedRowwise runs inside a streaming micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Similarity.hashEmbedRowwise(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("he_stream").start()
    try {
      in.addData((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      q.processAllAvailable()
      in.addData((3L, "alpha beta gamma"))
      q.processAllAvailable()
      val got = spark.table("he_stream")
        .as[(Long, Seq[Double])].collect().toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got(1L) == got(3L))                // pure function of content
      val want = graft.operators.Similarity.hashEmbed(
          Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Seq[Double])].collect().head._2
      assert(got(1L) == want)                   // batch == stream
    } finally q.stop()
  }

  // ------------------------------------------------------ logOddsTerms

  test("logOddsTerms surfaces the source-exclusive term first") {
    val docs = Seq(
      (1L, "a", "zebra common words here common words"),
      (2L, "a", "zebra common words more common stuff"),
      (3L, "b", "common words here common words stuff"),
      (4L, "b", "common words more okay common stuff")
    ).toDF("doc_id", "source", "text")
    val got = graft.operators.CorpusStats.logOddsTerms(
        docs, "source", "text", topK = 3)
      .as[(String, String, Long, Double)].collect()
    val aTop = got.filter(_._1 == "a").maxBy(_._4)
    assert(aTop._2 == "zebra")       // a-exclusive term is most distinctive
    assert(aTop._4 > 0.0)
    // shared terms never outrank the exclusive one for source a
    val aZ = got.filter(_._1 == "a").map(r => r._2 -> r._4).toMap
    aZ.filterNot(_._1 == "zebra").values.foreach(z => assert(z < aTop._4))
  }

  // ------------------------------------------------------ doremiMixture

  test("doremiMixture upweights the source the reference explains cheaply") {
    val ref = Seq((100L, "alpha beta alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "covered", "alpha beta"),            // low ce_ref → high excess
      (2L, "noise", "qqq www"),                 // floor ce_ref → low excess
      (3L, "covered", "alpha beta qqq www")     // balances corpus counts
    ).toDF("doc_id", "source", "text")
    val got = Curation.doremiMixture(docs, "doc_id", "source", "text",
        ref, "text")
      .orderBy("source")
      .as[(String, Long, Double, Double)].collect()
    val byName = got.map(r => r._1 -> r).toMap
    assert(byName("covered")._2 == 2L && byName("noise")._2 == 1L)
    assert(byName("covered")._3 > byName("noise")._3)  // mean excess
    assert(byName("covered")._4 > byName("noise")._4)  // MW weight
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5)   // normalized
  }

  // ------------------------------------------------ sourceOverlapSketch

  test("sourceOverlapSketch: identical=1, disjoint=0, small unions exact") {
    def mk(src: String, lo: Int, hi: Int) =
      (lo until hi).map(i => (s"$src$i", src, s"key$i distinct content $i"))
    // a == b (same 30 keys), c disjoint — all under the 64 sketch cut,
    // so every estimate is exact
    val docs = (mk("a", 0, 30).map(t => (t._1, "a", t._3)) ++
        mk("b", 0, 30).map(t => (t._1, "b", t._3)) ++
        mk("c", 100, 130).map(t => (t._1, "c", t._3)))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.Curation.sourceOverlapSketch(
        docs, "source", TextFns.tokenSetKey(col("text")))
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("a", "b"))
    assert(ab._3 == 30L && ab._4 == 30L && ab._5 == 1.0 && ab._6 == 30.0)
    val ac = got(("a", "c"))
    assert(ac._4 == 0L && ac._5 == 0.0 && ac._6 == 60.0)
  }

  test("sourceOverlapSketch estimate tracks true overlap at saturation") {
    // 300 keys per source, 100 shared: true Jaccard 100/500 = 0.2; the
    // 64-value synopsis must land in a loose but honest band
    def doc(i: Int) = s"unique payload number $i content word$i"
    val a = (0 until 300).map(i => (i.toLong, "a", doc(i)))
    val b = (0 until 300).map(i => (1000L + i, "b", doc(i + 200)))
    val got = graft.operators.Curation.sourceOverlapSketch(
        (a ++ b).toDF("doc_id", "source", "text"),
        "source", TextFns.tokenSetKey(col("text")))
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(got.length == 1)
    val r = got.head
    assert(r._3 == 64L)                       // saturated merge
    assert(r._5 > 0.05 && r._5 < 0.45, s"jaccard_est ${r._5}")
    assert(r._6 > 250.0 && r._6 < 1000.0, s"union_est ${r._6} (true 500)")
  }

  // --------------------------------------------- epochCapAllocation

  test("epochCapAllocation caps the boosted small source and re-flows") {
    val docs =
      ((1 to 10).map(i => (i.toLong, "big", ("t " * 1000).trim)) :+
        (99L, "small", ("t " * 100).trim))
        .toDF("doc_id", "source", "text")
    val got = Curation.epochCapAllocation(docs, "source",
        TextFns.tokenCount(col("text")), alpha = 0.5, cap = 1.5,
        budgetFrac = 1.0)
      .orderBy("source")
      .as[(String, Long, Double, Double, Double, Double, Boolean)].collect()
    val byName = got.map(r => r._1 -> r).toMap
    val small = byName("small")
    val big = byName("big")
    // temperature-boosted small share wants ~918 tokens, cap is 150
    assert(small._7 && small._5 == 150.0 && small._6 == 1.5)
    // the only uncapped source absorbs the full remaining budget exactly
    assert(!big._7 && big._5 == 10100.0 - 150.0)
    assert(math.abs(small._5 + big._5 - 10100.0) < 1e-6)
  }

  test("clusterMixtureWeights: vocab clusters separate; mixture conserves") {
    // two token-disjoint vocabularies -> hashed embeddings point along
    // two directions; seeds (first k=2 ids) are one doc of each, so the
    // argmax cells recover the vocabulary split exactly
    val docs = (
      (0L until 6L).map(i => (i, ("alpha beta gamma delta " * 5).trim)) ++
      (6L until 10L).map(i => (i, ("omega psi chi phi upsilon " * 8).trim)))
      .toDF("doc_id", "text")
    // seed convention needs one doc of EACH vocab in the first k ids:
    // remap doc 6..9 -> 1,7,8,9 by using ids 0 and 1 as the two seeds
    val fixed = docs.withColumn("doc_id",
      when(col("doc_id") === 6L, 1L)
        .when(col("doc_id") === 1L, 6L)
        .otherwise(col("doc_id")))
    val corpus = fixed.select(col("doc_id"), col("text"),
      graft.expressions.HashEmbedVec(
        TextFns.tokens(col("text")), 64).as("embedding"))
    val got = Similarity.clusterMixtureWeights(corpus, "doc_id", "embedding",
        TextFns.tokenCount(col("text")), k = 2, alpha = 0.7)
      .orderBy("cell")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(0L, 1L))      // both seed cells live
    assert(got.map(_._2).sum == 10L)                // every doc assigned
    val totalTokens = got.map(_._3).sum
    assert(totalTokens == 6L * 20 + 4L * 40)
    // the alpha-vocab cell holds the six alpha docs (seed 0), the
    // omega cell the four omega docs (seed 1, formerly doc 6)
    assert(got.find(_._1 == 0L).get._2 == 6L)
    assert(got.find(_._1 == 1L).get._2 == 4L)
    // shares normalize and the weight is the exact mixture identity
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-5)
    got.foreach { r =>
      assert(math.abs(r._6 - r._5 * totalTokens / r._3) < 1e-5)
    }
  }

  test("ngramJaccardPairsAuto: census engages rarity on templates only") {
    val template = (1 to 14).map(i => s"boiler$i").mkString(" ")
    def own(i: Long) = (0 to 25).map(j => s"w${i}_$j").mkString(" ")
    // 50% of docs share a template head (the skew-probe corpus shape)
    val skewed = (0L until 40L).map(i =>
      (i, if (i % 2 == 0) s"$template ${own(i)}" else own(i)))
      .toDF("doc_id", "text")
    // benign: every doc all-unique tokens
    val benign = (0L until 40L).map(i => (i, own(i))).toDF("doc_id", "text")
    val (shareSkew, _) = Dedup.hotShingleShare(skewed, "doc_id", "text", 3)
    val (shareBenign, _) = Dedup.hotShingleShare(benign, "doc_id", "text", 3)
    assert(shareSkew > Dedup.RarityEngageShare,
      f"template corpus share $shareSkew%.3f must engage rarity")
    assert(shareBenign < Dedup.RarityEngageShare,
      f"unique corpus share $shareBenign%.3f must stay on hash order")
    // either order is exact: the auto path's output equals BOTH pinned
    // orders on both corpora
    def pairs(df: org.apache.spark.sql.DataFrame, rarity: Boolean) =
      Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 3, threshold = 0.6,
          rarityOrder = rarity)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    def auto(df: org.apache.spark.sql.DataFrame) =
      Dedup.ngramJaccardPairsAuto(df, "doc_id", "text", n = 3,
          threshold = 0.6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
    assert(auto(skewed) == pairs(skewed, rarity = true))
    assert(auto(benign) == pairs(benign, rarity = false))
    assert(pairs(skewed, rarity = true) == pairs(skewed, rarity = false))
  }

  test("clusterRoute: float-typed embedding columns route like doubles") {
    // the routing family's seed collect widens to double first, so the
    // embeddings table's native array<float> is accepted exactly like
    // the hash-embed array<double> its siblings take (ADVICE round-13)
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val viaFloat = Similarity.clusterAssign(emb, "vec_id", "embedding", k = 4)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val dbl = emb.select(col("vec_id"),
      graft.functions.VectorFns.toDouble(col("embedding")).as("embedding"))
    val viaDouble = Similarity.clusterAssign(dbl, "vec_id", "embedding", k = 4)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    // identical assignment: VecDot widens elementwise either way, and
    // the collected seeds are the same doubles
    assert(viaFloat == viaDouble && viaFloat.nonEmpty)
    assert(viaFloat.values.toSet.subsetOf(
      viaFloat.keySet.toSeq.sorted.take(4).toSet))
  }

  test("epochCapAllocation: everything caps when the budget exceeds caps") {
    val docs = Seq(
      (1L, "a", ("t " * 100).trim),
      (2L, "b", ("t " * 100).trim)
    ).toDF("doc_id", "source", "text")
    val got = Curation.epochCapAllocation(docs, "source",
        TextFns.tokenCount(col("text")), alpha = 0.5, cap = 1.5,
        budgetFrac = 2.0)
      .orderBy("source")
      .as[(String, Long, Double, Double, Double, Double, Boolean)].collect()
    got.foreach { r =>
      assert(r._7, s"${r._1} should cap")       // both strata pinned at cap
      assert(r._5 == 150.0 && r._6 == 1.5)
    }
  }
}
