package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Redact}

/** Round-7 hygiene operators against hand-computed fixtures: unigram
  * cross-entropy, OOV rate, pattern scrubbing, source profiling, and
  * the dedup keep list.
  */
class HygieneSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  // --------------------------------------------------------- crossEntropy

  test("crossEntropy matches the hand-computed unigram formula") {
    // corpus: doc 1 = "a a b", doc 2 = "a c" → T = 5, C(a)=3, C(b)=1, C(c)=1
    val df = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Curation.crossEntropy(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // H(1) = -(2*ln(3/5) + 1*ln(1/5)) / 3
    val h1 = r6(-(2 * math.log(3.0 / 5) + math.log(1.0 / 5)) / 3)
    // H(2) = -(ln(3/5) + ln(1/5)) / 2
    val h2 = r6(-(math.log(3.0 / 5) + math.log(1.0 / 5)) / 2)
    assert(got.toSeq == Seq((1L, 3L, h1), (2L, 2L, h2)))
  }

  // -------------------------------------------------------------- oovRate

  test("oovRate counts exactly the tokens the vocab misses") {
    val df = Seq((1L, "a a b z"), (2L, "z z")).toDF("doc_id", "text")
    val vocab = Seq(("a", 1L), ("b", 2L)).toDF("term", "token_id")
    val got = Curation.oovRate(df, "doc_id", "text", vocab)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 2L, 1.0)))
  }

  // ---------------------------------------------------------------- scrub

  test("scrub masks emails before digit runs and counts each replacement") {
    val df = Seq(
      (1L, "contact bob.smith+x@mail.example.org or call 555 0199"),
      (2L, "no pii here"),
      (3L, "{\"k\": 69}")
    ).toDF("id", "payload")
    val got = Redact.scrub(df, "payload")
      .select("id", "scrubbed", "n_redactions")
      .orderBy("id").as[(Long, String, Long)].collect()
    // email masked FIRST: its digits never hit the digit-run rule
    assert(got(0) == ((1L, "contact <EMAIL> or call <NUM> <NUM>", 3L)))
    assert(got(1) == ((2L, "no pii here", 0L)))
    assert(got(2) == ((3L, "{\"k\": <NUM>}", 1L)))
  }

  test("scrub applies custom rules in order (later rules see earlier output)") {
    val df = Seq((1L, "xx yy")).toDF("id", "t")
    val got = Redact.scrub(df, "t", Seq("xx" -> "yy", "yy yy" -> "Z"))
      .select("scrubbed", "n_redactions").as[(String, Long)].collect().head
    // rule 1 rewrites "xx yy" → "yy yy"; rule 2 then matches the RESULT
    assert(got == (("Z", 2L)))
  }

  // -------------------------------------------------------- sourceProfile

  test("sourceProfile micro-averages per stratum") {
    val df = Seq(
      (1L, "s1", "a a a b"), // s1: 6 tokens, 3 distinct, top a=4
      (2L, "s1", "a c"),
      (3L, "s2", "x y")      // s2: 2 tokens, 2 distinct, top 1
    ).toDF("doc_id", "source", "text")
    val got = Curation.sourceProfile(df, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(got(0) == (("s1", 2L, 6L, 3L, 4L, 0.5, 0.666667)))
    assert(got(1) == (("s2", 1L, 2L, 2L, 1L, 1.0, 0.5)))
  }

  // ------------------------------------------------------- qualityVerdict

  test("qualityVerdict folds rules to keep/drop with ordered reasons") {
    val signals = Seq(
      (1L, 10L, 0.9), (2L, 100L, 0.9), (3L, 10L, 0.1), (4L, 100L, 0.1)
    ).toDF("doc_id", "n_tokens", "ratio")
    val got = Curation.qualityVerdict(signals, "doc_id", Seq(
        "short" -> (col("n_tokens") < 50),
        "skewed" -> (col("ratio") < 0.5)))
      .orderBy("doc_id").as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, "short"),
      (2L, 1L, ""),
      (3L, 0L, "short,skewed"),
      (4L, 0L, "skewed")))
  }

  // --------------------------------------------------------- applyMixture

  test("applyMixture repeats floor(w) times plus a deterministic fraction") {
    val docs = Seq.tabulate(200)(i =>
      (i.toLong, if (i < 100) "up" else "down")).toDF("doc_id", "lang")
    val weights = Seq(("up", 2.5), ("down", 0.5)).toDF("lang", "weight")
    val got = Curation.applyMixture(docs, "doc_id", "lang", weights)
    val counts = got.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    // every 'up' doc appears 2 or 3 times; 'down' docs 0 or 1
    assert((0L until 100L).forall(i => counts.get(i).exists(c => c == 2 || c == 3)))
    assert((100L until 200L).forall(i => counts.get(i).forall(_ == 1)))
    // the Bernoulli tail hits ~frac(w): wide margins for 100 draws
    val up3 = (0L until 100L).count(i => counts(i) == 3L)
    val downKept = (100L until 200L).count(counts.contains)
    assert(up3 > 25 && up3 < 75, s"frac(2.5) draws way off: $up3/100")
    assert(downKept > 25 && downKept < 75, s"frac(0.5) draws way off: $downKept/100")
    // copy indices are dense from 0
    val copies = got.filter(col("doc_id") === 0L)
      .select("copy").as[Long].collect().sorted.toSeq
    assert(copies == (0L until copies.length.toLong))
    // deterministic: identical on rerun
    val again = Curation.applyMixture(docs, "doc_id", "lang", weights)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(again == counts)
  }

  // ------------------------------------------------------------- keepList

  test("keepList keeps the highest-score member per cluster and all singletons") {
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 5L))
      .toDF("doc_id", "n_chars")
    // pairs chain 1-2 and 2-3 into one component {1,2,3}; 4 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.keepList(docs, "doc_id", "n_chars", pairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 0L), // cluster min-id is 1; doc 2 has the highest n_chars
      (2L, 1L, 1L),
      (3L, 1L, 0L),
      (4L, 4L, 1L))) // singleton keeps itself
  }

  test("softKeepList keeps ceil(sqrt(size)) per cluster, score-ranked") {
    // component {1..5}: ceil(sqrt 5) = 3 kept, by n_chars desc then id;
    // component {10,11}: ceil(sqrt 2) = 2 — a bare pair keeps BOTH;
    // singleton 20 kept
    val docs = Seq((1L, 10L), (2L, 50L), (3L, 40L), (4L, 40L), (5L, 5L),
      (10L, 7L), (11L, 9L), (20L, 1L)).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.softKeepList(docs, "doc_id", "n_chars", pairs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 5L, 0L),   // rank 4 (10 chars)
      (2L, 1L, 5L, 1L),   // rank 1 (50)
      (3L, 1L, 5L, 1L),   // rank 2 (40, id tiebreak)
      (4L, 1L, 5L, 1L),   // rank 3 (40)
      (5L, 1L, 5L, 0L),   // rank 5
      (10L, 10L, 2L, 1L),
      (11L, 10L, 2L, 1L),
      (20L, 20L, 1L, 1L)))
  }

  test("Profile.table counts rows/nulls/distincts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("b")), (None, Some("a"))
    ).toDF("k", "v")
    val got = graft.operators.Profile.table(df)
      .orderBy("col_name").as[(String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("k", 4L, 1L, 2L), ("v", 4L, 1L, 2L)))
  }

  test("keepList with no pairs keeps every doc as its own singleton") {
    val docs = Seq((1L, 10L), (2L, 20L)).toDF("doc_id", "n_chars")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val got = Dedup.keepList(docs, "doc_id", "n_chars", noPairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 1L), (2L, 2L, 1L)))
  }
}
