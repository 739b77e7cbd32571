package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.TextFns
import graft.operators.{Anomaly, Quality}
import graft.operators.Anomaly.AnomalyRule

/** ScalaCheck property tests (SURVEY §5.2): algebraic invariants of the
  * operators on randomized batches, checked against plain-Scala reference
  * implementations. Each sample is one batch (one Spark job), so test
  * counts are kept small.
  */
object OperatorProps extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val rowGen: Gen[(Option[Double], Option[String], Option[String])] =
    for {
      v <- Gen.option(Gen.choose(-1000.0, 1000.0))
      p <- Gen.option(Gen.alphaNumStr)
      t <- Gen.option(Gen.oneOf("click", "view", "error", "signup"))
    } yield (v, p, t)

  property("quality score == non-null fraction, within [0,1]") =
    forAll(Gen.listOfN(60, rowGen)) { rows =>
      val df = rows.toDF("v", "p", "t")
      val got = df.select(Quality.qualityScore(Seq("v", "p", "t"))).as[Double].collect()
      val want = rows.map { case (v, p, t) =>
        Seq(v.isDefined, p.isDefined, t.isDefined).count(identity) / 3.0 }
      got.forall(s => s >= 0.0 && s <= 1.0) && got.toSeq == want
    }

  private val rules = Seq(
    AnomalyRule("high", col("v") > 200.0, 1.0),
    AnomalyRule("mid", col("v") > 100.0, 0.5))

  private def refScore(v: Double): Double =
    if (v > 200.0) 1.0 else if (v > 100.0) 0.5 else 0.0

  property("anomaly CASE fold: first match wins == reference impl") =
    forAll(Gen.listOfN(80, Gen.choose(0.0, 300.0))) { vs =>
      val got = vs.toDF("v").select(Anomaly.score(rules)).as[Double].collect()
      got.toSeq == vs.map(refScore)
    }

  property("avg(when(cond,x)) == when-grouped avg (SURVEY §7.5.4)") =
    forAll(Gen.listOfN(100,
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-100.0, 100.0)))) { rows =>
      val df = rows.toDF("t", "v")
      // conventional form
      val conv = df.groupBy("t")
        .agg(avg(when(col("t") === "a", col("v"))).as("m"))
        .orderBy("t").collect().map(r => Option(r.get(1)))
      // the reference's form: aggregate inside when — equal because the
      // grouping key includes the condition column
      val ref = df.groupBy("t")
        .agg(when(first(col("t")) === "a", avg(col("v"))).as("m"))
        .orderBy("t").collect().map(r => Option(r.get(1)))
      conv.toSeq == ref.toSeq
    }

  property("bucket counts partition the total for any values") =
    forAll(Gen.listOfN(120, Gen.choose(0.0, 250.0))) { vs =>
      val r = vs.toDF("value")
        .agg(
          count(lit(1)).as("total"),
          count(when(col("value") >= 150.0, 1)).as("high"),
          count(when(col("value") >= 100.0 && col("value") < 150.0, 1)).as("mid"),
          count(when(col("value") < 100.0, 1)).as("low"))
        .collect().head
      r.getLong(0) == r.getLong(1) + r.getLong(2) + r.getLong(3)
    }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.oneOf("spark", "scan", "agg", "row", "table", "fast"))
      .map(_.mkString(" "))

  property("shingles: count bound, width n, self-Jaccard 1") =
    forAll(Gen.listOfN(20, textGen)) { texts =>
      val df = texts.toDF("t")
      val sh = df.select(TextFns.shingles(col("t"), 3)).as[Seq[String]].collect()
      sh.zip(texts).forall { case (grams, text) =>
        val tokens = text.split(" ").filter(_.nonEmpty)
        val bound = math.max(tokens.length - 2, 0)
        grams.length <= bound &&
          grams.forall(_.split(" ").length == 3) &&
          grams.distinct.length == grams.length
      }
    }

  property("token counts: whitespace count matches reference split") =
    forAll(Gen.listOfN(30, textGen)) { texts =>
      val got = texts.toDF("t")
        .select(TextFns.tokenCount(col("t"))).as[Int].collect()
      got.toSeq == texts.map(_.split("\\s+").count(_.nonEmpty))
    }

  property("VecDot == HOF fold bit-for-bit on random float vectors") =
    forAll(Gen.listOfN(15, Gen.zip(
      Gen.listOfN(16, Gen.choose(-10.0f, 10.0f)),
      Gen.listOfN(16, Gen.choose(-10.0f, 10.0f))))) { pairs =>
      val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      val rows = df.select(
        graft.functions.VectorFns.dot(col("a"), col("b")),
        graft.functions.VectorFns.dotHof(col("a"), col("b"))).collect()
      rows.forall(r =>
        java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }

  property("pigeonhole simhash pairs == brute force for random corpora/budgets") =
    forAll(
      Gen.listOfN(12, textGen.suchThat(_.nonEmpty)),
      Gen.choose(1, 11)) { (texts, budget) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val sigs = df.select(col("id"), graft.operators.Dedup.simHashPortable(col("t")))
        .as[(Long, Long)].collect().toMap
      val want = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= budget
      } yield (a, b, h)).toSeq.sorted
      val got = graft.operators.Dedup.simHashPortablePairs(df, "id", "t", budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
      got == want
    }

  /** Containment property: the df-capped candidate generation + exact
    * verify must equal a plain-Scala reference that applies the SAME
    * contract — pairs sharing at least one sub-cap shingle, containment
    * from the FULL sets. Low-entropy token domain forces shared shingles
    * and (at small caps) capped ones, exercising both the hit and the
    * documented miss path.
    */
  property("containment pairs == reference impl under the df-cap contract") =
    forAll(
      Gen.listOfN(10, textGen.suchThat(_.split(" ").length >= 3)),
      Gen.choose(2, 8)) { (texts, cap) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      val shingles: Map[Long, Set[String]] = texts.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.split(" ").sliding(3).map(_.mkString(" ")).toSet
      }.toMap.filter(_._2.nonEmpty)
      val docFreq = shingles.values.flatten.groupBy(identity).view.mapValues(_.size)
      val want = (for {
        a <- shingles.keys; b <- shingles.keys if a < b
        inter = shingles(a) intersect shingles(b)
        if inter.exists(g => docFreq(g) <= cap)
        c = inter.size.toDouble / math.min(shingles(a).size, shingles(b).size)
        if c >= 0.5
      } yield (a, b, math.floor(c * 1e6 + 0.5) / 1e6)).toSeq.sorted
      val got = graft.operators.Dedup.containmentPairs(df, "id", "t",
          n = 3, threshold = 0.5, dfCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq.sorted
      got == want
    }

  /** Tie-heavy as-of property: tiny key/timestamp domains force equal-ts
    * collisions on both sides, exercising the side ordering (right row
    * at the left timestamp matches) and the max-tie-id rule — checked
    * against a direct reference implementation, both directions.
    */
  property("as-of join == reference impl on tie-heavy random data") =
    forAll(
      Gen.listOfN(30, for {
        k <- Gen.choose(0L, 2L); ts <- Gen.choose(0L, 5L)
      } yield (k, ts)),
      Gen.listOfN(30, for {
        k <- Gen.choose(0L, 2L); ts <- Gen.choose(0L, 5L)
      } yield (k, ts)),
      Gen.oneOf(true, false)) { (ls, rs, forward) =>
      def t(s: Long) = new java.sql.Timestamp(s * 1000)
      val left = ls.zipWithIndex.map { case ((k, ts), i) => (k, i.toLong, t(ts)) }
        .toDF("k", "lid", "lts")
      val right = rs.zipWithIndex.map { case ((k, ts), i) => (k, i.toLong, t(ts)) }
        .toDF("k", "rid", "rts")
      val got = graft.operators.AsOf
        .join(left, right, Seq("k"), "lts", "rts", "rid", forward = forward)
        .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap
      val want = ls.zipWithIndex.map { case ((k, lts), i) =>
        val cand = rs.zipWithIndex.filter { case ((rk, rts), _) =>
          rk == k && (if (forward) rts >= lts else rts <= lts) }
        val best =
          if (cand.isEmpty) None
          else if (forward) Some(cand.minBy { case ((_, rts), ri) => (rts, ri) })
          else Some(cand.maxBy { case ((_, rts), ri) => (rts, ri) })
        i.toLong -> best.map(_._2.toLong)
      }.toMap
      got == want
    }

  /** keepList vs a plain-Scala union-find on random pair graphs: every
    * doc labeled with its true component's min id, exactly one keeper
    * per cluster, and the keeper is the (score DESC, id ASC) argmax.
    */
  property("keepList == union-find reference on random pair graphs") =
    forAll(
      Gen.listOfN(15, for {
        a <- Gen.choose(0L, 11L); b <- Gen.choose(0L, 11L) if a != b
      } yield (math.min(a, b), math.max(a, b))),
      Gen.listOfN(12, Gen.choose(0L, 50L))) { (pairEdges, scores) =>
      val docs = scores.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val parent = Array.tabulate(12)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairEdges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val cluster = (0 until 12).map(i => i.toLong -> find(i).toLong).toMap
      val wantKeep = docs.groupBy { case (id, _) => cluster(id) }.map {
        case (c, members) => c -> members.maxBy { case (id, s) => (s, -id) }._1
      }
      val got = graft.operators.Dedup.keepList(
          docs.toDF("id", "score"), "id", "score",
          pairEdges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (id, c, keep) =>
        c == cluster(id) && keep == (if (wantKeep(c) == id) 1L else 0L)
      } && got.count(_._3 == 1L) == cluster.values.toSet.size
    }

  property("rolling-hash fingerprint stays in [0, 1e9+7)") = Prop.secure {
    val texts = List("spark agg row", "", "x", "a b c d e f g h i j")
    val got = texts.toDF("text")
      .select(expr(
        """aggregate(transform(regexp_extract_all(text, '.', 0), c -> bigint(ascii(c))),
          | 7L, (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin))
      .as[Long].collect()
    got.forall(h => h >= 0L && h < 1000000007L)
  }

  property("RollingHash kernel == HOF formula on random ASCII text") =
    forAll(Gen.listOfN(25,
      Gen.listOf(Gen.choose(' ', '~')).map(_.mkString))) { texts =>
      val df = texts.toDF("text")
      val rows = df.select(
        graft.expressions.RollingHash(col("text")),
        expr("""aggregate(transform(regexp_extract_all(text, '.', 0), c -> bigint(ascii(c))),
               | 7L, (a, c) -> (a * 31 + c) % 1000000007)""".stripMargin))
        .as[(Long, Long)].collect()
      rows.forall(r => r._1 == r._2)
    }

  property("WordNGrams kernel == zip-of-slices HOF formula on random text") =
    forAll(
      Gen.listOfN(20, Gen.listOf(Gen.oneOf("a", "bb", "c", "", "d e"))
        .map(_.mkString(" "))),
      Gen.choose(2, 6)) { (texts, n) =>
      val df = texts.toDF("text")
      val rows = df.select(
        graft.functions.TextFns.ngrams(col("text"), n),
        graft.functions.TextFns.ngramsHof(col("text"), n))
        .as[(Seq[String], Seq[String])].collect()
      rows.forall(r => r._1 == r._2)
    }

  property("HashedGramScore kernel == lookup-fold HOF formula on random text") =
    forAll(
      Gen.listOfN(15, Gen.listOf(Gen.oneOf("a", "bb", "c", "", "d e"))
        .map(_.mkString(" "))),
      Gen.choose(2, 4)) { (texts, n) =>
      val buckets = 64
      val lam = IndexedSeq.tabulate(buckets)(b => (b * 37 % 23) * 0.125 - 1.0)
      val toks = graft.functions.TextFns.tokens(col("text"))
      val hof = aggregate(
        transform(graft.expressions.WordNGrams(toks, n), g =>
          element_at(typedlit(lam),
            (pmod(graft.operators.Splits.portableHash(g, "dsir"),
              lit(buckets)) + 1).cast("int"))),
        lit(0.0), (acc, x) => acc + x)
      val rows = texts.toDF("text").select(
        graft.expressions.HashedGramScore(toks, n, "dsir", lam), hof)
        .as[(Double, Double)].collect()
      rows.forall(r => r._1 == r._2)
    }

  property("Md5Hash60 kernel == hex-string formula of record") =
    forAll(Gen.listOfN(25, Gen.listOf(Gen.choose(' ', '~')).map(_.mkString))) {
      texts =>
        val rows = texts.toDF("t").select(
          graft.functions.TextFns.md5Hash60(col("t")),
          graft.functions.TextFns.md5Hash60Formula(col("t")))
          .as[(Long, Long)].collect()
        rows.forall(r => r._1 == r._2)
    }

  property("BpeMergePair == leftmost-greedy reference fold") =
    forAll(
      Gen.listOf(Gen.oneOf("a", "b", "c", "ab")),
      Gen.oneOf(("a", "b"), ("a", "a"), ("ab", "c"), ("c", "c"))) {
      (syms, pair) =>
        def ref(xs: List[String]): List[String] = xs match {
          case a :: b :: rest if a == pair._1 && b == pair._2 =>
            (a + b) :: ref(rest)
          case x :: rest => x :: ref(rest)
          case Nil       => Nil
        }
        val got = Seq(Tuple1(syms)).toDF("syms")
          .select(graft.expressions.BpeMergePair(col("syms"), pair._1, pair._2))
          .as[Seq[String]].collect().head
        got.toList == ref(syms)
    }

  property("PqAssign == reference per-subspace L2 argmin") =
    forAll(
      Gen.listOfN(6, Gen.listOfN(4, Gen.choose(-5.0f, 5.0f))),
      Gen.listOfN(2, Gen.listOfN(3, Gen.listOfN(2, Gen.choose(-5.0, 5.0))))) {
      (vecs, cb) =>
        def ref(v: List[Float]): Seq[Int] = cb.indices.map { s =>
          val cells = cb(s)
          cells.indices.minBy { c =>
            (0 until 2).foldLeft(0.0) { (d, j) =>
              val diff = v(s * 2 + j).toDouble - cells(c)(j)
              d + diff * diff
            }
          }
        }
        val got = vecs.toDF("e")
          .select(graft.expressions.PqAssign(col("e"), cb))
          .as[Seq[Int]].collect()
        got.toSeq == vecs.map(ref)
    }

  // small alphabet so repeats/top-grams genuinely occur
  private val docGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "bc")).map(_.mkString(" "))

  property("repetitionStatsRowwise == aggregate path on random docs") =
    forAll(Gen.listOfN(10, docGen)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.orderBy("id")
          .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
      canon(graft.operators.Curation.repetitionStatsRowwise(df, "id", "text")) ==
        canon(graft.operators.Curation.repetitionStats(df, "id", "text"))
    }

  property("shardAssign is invariant to input partitioning and order") =
    forAll(Gen.choose(1, 6), Gen.choose(20, 60)) { (shards, n) =>
      val base = (0L until n.toLong).map(Tuple1(_)).toDF("id")
      def canon(d: org.apache.spark.sql.DataFrame) =
        graft.operators.Curation.shardAssign(d, "id", shards)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
          .sortBy(_._1).toSeq
      val a = canon(base)
      val b = canon(base.repartition(7).orderBy(col("id").desc))
      // identical assignment, shards in range, positions a permutation
      a == b &&
        a.forall { case (_, s, _) => s >= 0 && s < shards } &&
        a.groupBy(_._2).values.forall(rows =>
          rows.map(_._3).sorted == (0L until rows.length).toList)
    }

  property("deltaDedup == reference classification on random keys") =
    forAll(Gen.listOfN(12, Gen.choose(0, 5)), Gen.listOfN(10, Gen.choose(0, 5))) {
      (exKeys, incKeys) =>
        val existing = exKeys.zipWithIndex.map { case (k, i) =>
          (i.toLong, s"k$k") }
        val incoming = incKeys.zipWithIndex.map { case (k, i) =>
          ((100 + i).toLong, s"k$k") }
        val corpusKeeper = existing.groupBy(_._2).map { case (k, rs) =>
          k -> rs.map(_._1).min }
        val batchKeeper = incoming.groupBy(_._2).map { case (k, rs) =>
          k -> rs.map(_._1).min }
        val want = incoming.map { case (id, k) =>
          corpusKeeper.get(k) match {
            case Some(ck) => (id, "dup_of_corpus", Some(ck))
            case None if batchKeeper(k) == id => (id, "new", None)
            case None => (id, "dup_in_batch", Some(batchKeeper(k)))
          }
        }.sortBy(_._1)
        val got = graft.operators.Dedup.deltaDedup(
            existing.toDF("id", "key"), incoming.toDF("id", "key"),
            "id", col("key"))
          .orderBy("id").as[(Long, String, Option[Long])].collect().toSeq
        got == want
    }

  property("bpePairCounts == reference pair census on random words") =
    forAll(Gen.listOfN(15,
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString))) { words =>
      val text = words.mkString(" ")
      val wc = words.groupBy(identity).view.mapValues(_.size.toLong)
      val want = wc.toSeq.filter(_._1.length >= 2).flatMap { case (w, c) =>
        w.sliding(2).map(_ -> c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (p, c) => (-c, p) }
      val got = graft.operators.Curation.bpePairCounts(
          Seq((1L, text)).toDF("id", "text"), "text", k = 1000)
        .as[(String, Long)].collect().toSeq
      got == want
    }

  /** Plain-Scala restatement of [[TextFns.md5Hash60]] (first 15 md5 hex
    * digits as a long) for reference implementations below.
    */
  private def md5Hash60Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private val cdcDocGen: Gen[List[String]] =
    Gen.choose(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg")))

  property("cdcChunkStats == reference chunker on random corpora") =
    forAll(Gen.listOfN(4, cdcDocGen)) { docTokens =>
      val docs = docTokens.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.mkString(" ")) }
      // reference: chunk ends AFTER a token whose hash % 8 == 0
      val refChunks = docs.flatMap { case (id, text) =>
        val toks = text.split(" ").toList
        val chunks = scala.collection.mutable.ListBuffer.empty[List[String]]
        var cur = scala.collection.mutable.ListBuffer.empty[String]
        toks.foreach { t =>
          cur += t
          if (md5Hash60Ref("cdc:" + t) % 8 == 0) {
            chunks += cur.toList; cur = scala.collection.mutable.ListBuffer.empty
          }
        }
        if (cur.nonEmpty) chunks += cur.toList
        chunks.toList.zipWithIndex.map { case (c, ci) => (id, ci, c) }
      }
      val firstOcc = refChunks.groupBy(_._3).view
        .mapValues(_.map(t => (t._1, t._2)).min).toMap
      val want = refChunks.groupBy(_._1).view.mapValues { cs =>
        val dup = cs.filterNot(c => firstOcc(c._3) == ((c._1, c._2)))
        (cs.size.toLong, cs.map(_._3.size).sum.toLong,
          dup.size.toLong, dup.map(_._3.size).sum.toLong)
      }.toMap
      val got = graft.operators.Dedup.cdcChunkStats(
          docs.toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Double)].collect()
      got.length == want.size && got.forall { case (id, nc, nt, ndc, dt, _) =>
        want(id) == ((nc, nt, ndc, dt))
      }
    }

  private val strataGen: Gen[List[(String, Long)]] =
    Gen.choose(2, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(10L, 5000L)).map(_.zipWithIndex.map {
        case (tok, i) => (s"s$i", tok)
      }))

  property("epochCapAllocation: caps respected, budget conserved") =
    forAll(strataGen) { strata =>
      val df = strata.toDF("source", "n")
      val got = graft.operators.Curation.epochCapAllocation(
          df, "source", col("n"), alpha = 0.5, cap = 1.5, budgetFrac = 1.0)
        .as[(String, Long, Double, Double, Double, Double, Boolean)]
        .collect()
      val budget = strata.map(_._2).sum.toDouble
      val eps = 1e-5 * strata.size
      val capsOk = got.forall { case (_, n, _, capT, alloc, _, capped) =>
        capT == 1.5 * n && alloc <= capT + eps &&
          (!capped || math.abs(alloc - capT) <= eps)
      }
      val anyUncapped = got.exists(!_._7)
      // with an uncapped stratum left, the re-flow spends the budget
      // exactly; all-capped leaves the residual unspent by design
      val sumOk =
        if (anyUncapped) math.abs(got.map(_._5).sum - budget) <= eps
        else got.map(_._5).sum <= budget + eps
      capsOk && sumOk
    }

  private val rhoCorpusGen: Gen[List[(Long, String)]] =
    Gen.choose(3, 6).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(
        Gen.oneOf("red", "green", "blue", "cyan", "teal")).map(_.mkString(" ")))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))

  property("rhoSelection ce_train column == crossEntropy on the corpus") =
    forAll(rhoCorpusGen) { rows =>
      val corpus = rows.toDF("doc_id", "text")
      val ref = rows.take(1).toDF("doc_id", "text")
      val rho = graft.operators.Curation.rhoSelection(
          corpus, "doc_id", "text", ref, "text", m = rows.size)
        .select(col("doc_id"), col("ce_train"))
        .as[(Long, Double)].collect().toMap
      val ce = graft.operators.Curation.crossEntropy(corpus, "doc_id", "text")
        .select(col("doc_id"), col("cross_entropy"))
        .as[(Long, Double)].collect().toMap
      rho.keySet == ce.keySet && rho.forall { case (id, v) => ce(id) == v }
    }

  private val vecGen: Gen[List[IndexedSeq[Float]]] =
    Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(16,
        Gen.choose(-1.0f, 1.0f)).map(_.toIndexedSeq)))

  property("sq8TopKBatch cosines within quantization error of exact") =
    forAll(vecGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val n = vecs.size
      val exact = graft.operators.Similarity.topKBatch(
          df, "vec_id", "embedding", df, "vec_id", k = n)
        .withColumnRenamed("cos_sim", "cos_exact")
      val sq8 = graft.operators.Similarity.sq8TopKBatch(
          df, "vec_id", "embedding", df, "vec_id", k = n)
      val joined = sq8.join(exact, Seq("query_id", "vec_id"))
        .select(col("cos_sim"), col("cos_exact"))
        .as[(Double, Double)].collect()
      // per-dim code resolution is (mx-mn)/255 ≤ 2/255; 16 dims of
      // worst-case half-step error stay well inside 0.1 cosine even for
      // short vectors
      joined.nonEmpty && joined.forall { case (a, b) => math.abs(a - b) < 0.1 }
    }

  property("hashEmbed == reference feature hashing on random corpora") =
    forAll(Gen.listOfN(3, Gen.nonEmptyListOf(
      Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.mkString(" ")))) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val dim = 64
      val want = docs.map { case (id, text) =>
        val v = new Array[Long](dim)
        text.split(" ").foreach { t =>
          val h = md5Hash60Ref("he:" + t)
          val s = if ((h / dim) % 2 == 0) 1L else -1L
          v((h % dim).toInt) += s
        }
        val n2 = v.map(x => x * x).sum
        id -> v.map(x =>
          if (n2 > 0)
            BigDecimal(x / math.sqrt(n2.toDouble))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else 0.0).toSeq
      }.toMap
      val got = graft.operators.Similarity.hashEmbed(
          docs.toDF("doc_id", "text"), "doc_id", "text", dim)
        .as[(Long, Seq[Double])].collect().toMap
      got.keySet == want.keySet &&
        got.forall { case (id, v) => want(id) == v }
    }

  private val mmTextGen: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    Gen.identifier.map(_.take(8)),
    Gen.oneOf("naïve", "日本語", "ÿ", "résumé", "mixed123")))
    .map(_.mkString(" "))

  property("JfifImage round-trips through the marker walk on any text") =
    forAll(Gen.listOfN(12, mmTextGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val rows = graft.operators.Multimodal.decodeImageFeatures(
          graft.operators.Multimodal.packJfif(
            docs.toDF("id", "t"), "id", "t"), "id")
        .orderBy("id").collect()
      rows.zip(docs).forall { case (r, (_, t)) =>
        val n = t.getBytes("UTF-8").length
        val expectH = math.max((n + 15) / 16, 1)
        r.getString(1) == "jpeg" && r.getInt(2) == 16 &&
          r.getInt(3) == expectH && r.getInt(4) == 3 && r.isNullAt(5)
      }
    }

  property("minHashPairs with hotBucketDrop is a subset of the full output") =
    forAll(Gen.listOfN(14, mmTextGen), Gen.choose(2, 12)) { (texts, drop) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      def pairs(d: Int) = graft.operators.Dedup
        .minHashPairs(docs, "id", "t", n = 2, threshold = 0.3,
          hotBucketDrop = d)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      pairs(drop).subsetOf(pairs(0))
    }

  property("multi-probe pairs ⊇ single-probe at the same width; flips=0 ==") =
    forAll(Gen.listOfN(24,
      Gen.listOfN(16, Gen.choose(-1.0f, 1.0f)))) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "e")
      def ps(f: => org.apache.spark.sql.DataFrame) =
        f.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val single = ps(graft.operators.Similarity.lshNearDupPairs(
        df, "id", "e", threshold = 0.5, rowsPerBand = 16))
      val multi = ps(graft.operators.Similarity.lshNearDupPairsMultiProbe(
        df, "id", "e", threshold = 0.5, rowsPerBand = 16))
      val exact = ps(graft.operators.Similarity.lshNearDupPairsMultiProbe(
        df, "id", "e", threshold = 0.5, rowsPerBand = 16, flips = 0))
      single.subsetOf(multi) && exact == single
    }

  property("rarity-order prefix == hash-order prefix on random corpora") =
    forAll(Gen.listOfN(12, mmTextGen)) { texts =>
      // the prefix filter is exact under ANY consistent global order —
      // both orders must produce identical verified pairs on arbitrary
      // (template-free and template-heavy alike) inputs
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "t")
      def pairs(rarity: Boolean) = graft.operators.Dedup
        .ngramJaccardPairs(docs, "id", "t", n = 2, threshold = 0.4,
          rarityOrder = rarity)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sorted.toSeq
      pairs(rarity = false) == pairs(rarity = true)
    }

  property("recallCapRowsPerBand: landmarks, monotone in threshold and target") =
    Prop {
      val f = graft.operators.Similarity.recallCapRowsPerBand _
      // the measured design point: threshold 0.8, target 0.9 -> 12 bits
      // (uncapped 17 measured 0.811 recall; capped 12 measured 0.995)
      f(0.8, 0.9) == 12 &&
        // higher-cosine thresholds admit wider bands, looser targets too
        f(0.95, 0.9) >= f(0.8, 0.9) &&
        f(0.8, 0.5) >= f(0.8, 0.9) &&
        f(0.8, 0.99) <= f(0.8, 0.9) &&
        // floors: a brutal target or low threshold falls back to 8
        f(0.3, 0.99) == 8 &&
        // and the result always stays in the band-width domain
        Seq(0.4, 0.6, 0.8, 0.9, 0.99).forall { t =>
          val w = f(t, 0.9); w >= 8 && w <= 20
        }
    }

  property("ImageFeatures never throws: arbitrary bytes decode null or typed") =
    forAll(Gen.listOfN(10, Gen.oneOf(
      // pure fuzz, and adversarial prefixes of each recognized format:
      // a JPEG SOI / PNG signature / BMP magic followed by random bytes
      Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray),
      Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte))
        .map(t => Array(0xff.toByte, 0xd8.toByte) ++ t),
      Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte))
        .map(t => Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a,
          0x0a) ++ t),
      Gen.nonEmptyListOf(Gen.choose(-128, 127).map(_.toByte))
        .map(t => Array[Byte]('B', 'M') ++ t)))) { payloads =>
      val rows = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("id", "payload")
        .select(col("id"),
          graft.expressions.ImageFeatures(col("payload")).as("f"))
        .collect()
      rows.forall { r =>
        r.isNullAt(1) || {
          val fmt = r.getStruct(1).getString(0)
          fmt == "bmp" || fmt == "png" || fmt == "jpeg"
        }
      }
    }
}
