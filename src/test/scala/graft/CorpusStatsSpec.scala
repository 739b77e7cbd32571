package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Corpus-law diagnostics (q129/q130): exact-quantized OLS fits. */
class CorpusStatsSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  test("zipfFit recovers slope -1 on an exactly Zipfian corpus") {
    // counts C/rank: 12, 6, 4, 3 → ln cnt = ln 12 − 1·ln rank exactly
    val text = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val df = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val row = CorpusStats.zipfFit(df, "text", topK = 4).head()
    assert(row.getAs[Long]("n_terms") == 4L)
    assert(math.abs(row.getAs[Double]("zipf_slope") + 1.0) < 1e-6,
      s"slope ${row.getAs[Double]("zipf_slope")}")
    assert(math.abs(row.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("zipfFit ranks deterministically under count ties and repartition") {
    val docs = (0L until 40L)
      .map(i => (i, s"t${i % 7} t${i % 5} common filler"))
    val df = docs.toDF("doc_id", "text")
    val a = CorpusStats.zipfFit(df, "text", topK = 10).head()
    val b = CorpusStats.zipfFit(df.repartition(13), "text", topK = 10).head()
    assert(a == b)
  }

  test("heapsFit: sublinear growth on a repetitive corpus, exact on fresh") {
    // every doc repeats the same 3 words → V saturates at 3, beta ≈ 0
    val rep = (0L until 50L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val beta = CorpusStats.heapsFit(rep, "doc_id", "text", buckets = 10)
      .head().getAs[Double]("heaps_beta")
    assert(beta < 0.05, s"repetitive corpus must saturate, beta=$beta")
    // every doc introduces only new words at a constant rate → V = N,
    // beta = 1 and k = 1 exactly
    val fresh = (0L until 50L)
      .map(i => (i, s"w${i}a w${i}b w${i}c")).toDF("doc_id", "text")
    val row = CorpusStats.heapsFit(fresh, "doc_id", "text", buckets = 10)
      .head()
    assert(math.abs(row.getAs[Double]("heaps_beta") - 1.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("heaps_k") - 1.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("rakeKeywords: deg/freq scoring, stopword runs, alpha tiebreak") {
    // phrases: "good morning" | "weather" | "nice"
    // freq: all 1; deg: good 2, morning 2, weather 1, nice 1
    // scores: good-morning 4.0; nice 1.0; weather 1.0 (tie → alpha)
    val df = Seq((1L, "good morning the weather is nice"))
      .toDF("doc_id", "text")
    val got = CorpusStats.rakeKeywords(df, "doc_id", "text", k = 3)
      .orderBy("rank").as[(Long, Long, String, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, "good morning", 4.0),
      (1L, 2L, "nice", 1.0),
      (1L, 3L, "weather", 1.0)))
  }

  test("rakeKeywords word stats are corpus-wide and repartition-stable") {
    // "alpha beta" in doc 1 and "alpha" alone in doc 2: freq(alpha)=2,
    // deg(alpha)=2+1=3 → doc 2's "alpha" scores 1.5, not 1.0
    val df = Seq((1L, "alpha beta"), (2L, "alpha")).toDF("doc_id", "text")
    val got = CorpusStats.rakeKeywords(df, "doc_id", "text", k = 1)
      .orderBy("doc_id").as[(Long, Long, String, Double)].collect().toSeq
    assert(got.map(_._3) == Seq("alpha beta", "alpha"))
    assert(got(1)._4 == 1.5, s"corpus-wide freq/deg expected: $got")
    val again = CorpusStats.rakeKeywords(df.repartition(5), "doc_id",
        "text", k = 1)
      .orderBy("doc_id").as[(Long, Long, String, Double)].collect().toSeq
    assert(again == got)
  }

  test("knBigramScore: discount, continuation backoff, OOV accounting") {
    // train (ids 1-3): bigrams (a,b) (a,c) (b,c) → c1(a)=2 fwd(a)=2,
    // bwd(b)=1 bwd(c)=2, B=3
    val df = Seq(
      (0L, "a b"),   // eval: seen bigram → max(1-.75,0)/2 + .75*2/2*(1/3)
      (5L, "z c"),   // eval: unseen context z → pure continuation 2/3
      (10L, "x q"),  // eval: q never a continuation → OOV
      (1L, "a b"), (2L, "a c"), (3L, "b c")).toDF("doc_id", "text")
    val got = CorpusStats.knBigramScore(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, 1L, 0L), (5L, 1L, 0L), (10L, 1L, 1L)))
    assert(math.abs(got(0)._4 - math.log(0.375)) < 1e-5, s"${got(0)}")
    assert(math.abs(got(1)._4 - math.log(2.0 / 3.0)) < 1e-5, s"${got(1)}")
    assert(got(2)._4 == 0.0)
    val again = CorpusStats.knBigramScore(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("knTrigramScore: three-level interpolation, hand-computed") {
    // train (ids 1-3): trigrams (a,b,c)×2, (a,b,d)×1 →
    // ctx(a,b): c12t=3 fwd12=2; types (b,c),(b,d) → mid(b): n=2 fwd=2;
    // cu(c)=cu(d)=1, B=2
    val df = Seq(
      (0L, "a b c"),   // full head: max(2-.75,0)/3 + .75*2/3*(pMid=0.5) = 2/3
      (5L, "z b c"),   // unseen (z,b) context → middle level: 0.5
      (10L, "z y c"),  // unseen y context too → continuation unigram: 0.5
      (15L, "a b q"),  // q never a continuation anywhere → OOV
      (1L, "a b c"), (2L, "a b d"), (3L, "a b c")).toDF("doc_id", "text")
    val got = CorpusStats.knTrigramScore(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, 1L, 0L), (5L, 1L, 0L), (10L, 1L, 0L), (15L, 1L, 1L)))
    assert(math.abs(got(0)._4 - math.log(2.0 / 3.0)) < 1e-5, s"${got(0)}")
    assert(math.abs(got(1)._4 - math.log(0.5)) < 1e-5, s"${got(1)}")
    assert(math.abs(got(2)._4 - math.log(0.5)) < 1e-5, s"${got(2)}")
    assert(got(3)._4 == 0.0)
    val again = CorpusStats.knTrigramScore(df.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("heapsFit is a pure function of doc ids (repartition-stable)") {
    val docs = (0L until 60L)
      .map(i => (i, s"c1 c2 u${i % 17} u${i % 23}")).toDF("doc_id", "text")
    val a = CorpusStats.heapsFit(docs, "doc_id", "text").head()
    val b = CorpusStats.heapsFit(docs.repartition(7), "doc_id", "text").head()
    assert(a == b)
  }
}
