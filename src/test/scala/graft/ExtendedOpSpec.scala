package graft

import org.apache.spark.sql.functions._

import graft.expressions.KMinValues
import graft.functions.TfIdf
import graft.operators.{AsOf, Quantiles, RangeJoin, Splits}

/** Unit tests for the round-5 extension operators: as-of join, binned
  * range joins, the KMV distinct sketch, deterministic splits, TF-IDF,
  * and quantiles — each checked against a brute-force or hand-computed
  * answer on fixtures small enough to reason about.
  */
class ExtendedOpSpec extends SparkSpec {
  private lazy val sess = spark
  import sess.implicits._

  // -------------------------------------------------------------- as-of

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("AsOf.join matches the latest prior right row; <= and tie semantics") {
    val left = Seq(
      (1L, 10L, ts(5000000)),   // before any right row -> null payload
      (1L, 11L, ts(20000000)),  // exactly at a right ts -> that row matches
      (1L, 12L, ts(30000000)),  // two right rows tied at 20s -> max tie wins
      (2L, 20L, ts(25000000))   // other key
    ).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 100L, ts(20000000)),
      (1L, 101L, ts(20000000)), // tied ts, larger tie id
      (1L, 102L, ts(31000000)), // after every left row
      (2L, 200L, ts(24000000))
    ).toDF("k", "rid", "rts")
    val got = AsOf.join(left, right, Seq("k"), "lts", "rts", "rid")
      .select($"lid", $"rid")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> None, 11L -> Some(101L), 12L -> Some(101L),
      20L -> Some(200L)))
  }

  test("AsOf.join forward + tolerance variants") {
    val left = Seq(
      (1L, 10L, ts(20000000)),  // right rows at 20s (tied) and 31s follow
      (1L, 11L, ts(32000000)),  // nothing follows
      (1L, 12L, ts(5000000))    // 20s follows but is 15s away
    ).toDF("k", "lid", "lts")
    val right = Seq(
      (1L, 100L, ts(20000000)),
      (1L, 101L, ts(20000000)),
      (1L, 102L, ts(31000000))
    ).toDF("k", "rid", "rts")
    val fwd = AsOf.join(left, right, Seq("k"), "lts", "rts", "rid", forward = true)
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    // earliest following; equal-ts ties -> SMALLEST tie
    assert(fwd == Map(10L -> Some(100L), 11L -> None, 12L -> Some(100L)))
    val tol = AsOf.join(left, right, Seq("k"), "lts", "rts", "rid",
        forward = true, toleranceUs = Some(11000000L))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    // 15s-away match for lid=12 is beyond the 11s tolerance
    assert(tol == Map(10L -> Some(100L), 11L -> None, 12L -> None))
  }

  test("AsOf.join equals brute-force on events sf0.001") {
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))
    val got = AsOf.join(purchases, clicks, Seq("user_id"), "ts", "click_ts", "click_id")
      .select($"event_id", coalesce($"click_id", lit(-1L)))
      .as[(Long, Long)].collect().toMap
    // brute force: max (ts, id) click at-or-before each purchase
    val cl = clicks.select($"user_id", unix_micros($"click_ts"), $"click_id")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val expect = purchases.select($"event_id", $"user_id", unix_micros($"ts"))
      .as[(Long, Long, Long)].collect().map { case (eid, u, us) =>
        val best = cl.getOrElse(u, Array.empty)
          .filter(_._2 <= us).sortBy(c => (c._2, c._3)).lastOption
        eid -> best.map(_._3).getOrElse(-1L)
      }.toMap
    assert(got == expect)
  }

  test("operator contracts fail fast on misuse") {
    val l = Seq((1L, 2L, ts(1000))).toDF("k", "x", "lts")
    val r = Seq((1L, 3L, ts(1000))).toDF("k", "x", "rts") // x collides
    intercept[IllegalArgumentException] {
      graft.operators.AsOf.join(l, r, Seq("k"), "lts", "rts", "x")
    }
    val a = Seq((1L, 2L)).toDF("lo", "hi")
    intercept[IllegalArgumentException] { // same names both sides
      RangeJoin.intervalJoin(a, a, "lo", "hi", "lo", "hi", 10)
    }
    intercept[IllegalArgumentException] { // non-positive bin width
      RangeJoin.intervalJoin(a, a.toDF("l2", "h2"), "lo", "hi", "l2", "h2", 0)
    }
    intercept[IllegalArgumentException] { // bloom words not a power of two
      graft.operators.Bloom.build(a, col("lo"), words = 48)
    }
    intercept[IllegalArgumentException] { // invalid split weights
      Splits.assign(col("lo"), Seq("train" -> 0))
    }
  }

  // -------------------------------------------------------------- ranges

  test("intervalJoin: exact pair set, each pair exactly once") {
    // intervals crafted to span multiple bins (width 10) and to overlap
    // in several shared bins — the canonical-bin rule must emit 1 copy
    val a = Seq((1L, 0L, 25L), (2L, 30L, 31L), (3L, 50L, 99L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 5L, 40L), (11L, 26L, 29L), (12L, 95L, 200L), (13L, 300L, 301L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 10)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    // brute force over the cross product
    assert(got == Seq((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("intervalJoin equals brute-force on random intervals across bin widths") {
    val rnd = new scala.util.Random(7)
    val xs = (1 to 120).map(i => (i.toLong, rnd.nextInt(500).toLong))
      .map { case (i, lo) => (i, lo, lo + rnd.nextInt(60)) }
    val brute = for {
      (i, lo, hi) <- xs; (j, lo2, hi2) <- xs
      if lo <= hi2 && lo2 <= hi
    } yield (i, j)
    val l = xs.toDF("l_id", "l_lo", "l_hi")
    val r = xs.toDF("r_id", "r_lo", "r_hi")
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.intervalJoin(l, r, "l_lo", "l_hi", "r_lo", "r_hi", w)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got == brute.sorted, s"binWidth=$w")
    }
  }

  test("pointJoin equals brute-force") {
    val pts = (0L to 100L by 3).map(p => (p, p)).toDF("p_id", "p")
    val iv = Seq((1L, 10L, 20L), (2L, 15L, 15L), (3L, 90L, 300L))
      .toDF("i_id", "lo", "hi")
    val got = RangeJoin.pointJoin(pts, "p", iv, "lo", "hi", binWidth = 8)
      .select($"p_id", $"i_id").as[(Long, Long)].collect().sorted.toSeq
    val brute = for {
      p <- 0L to 100L by 3; (i, lo, hi) <- Seq((1L, 10L, 20L), (2L, 15L, 15L), (3L, 90L, 300L))
      if p >= lo && p <= hi
    } yield (p, i)
    assert(got == brute.sorted)
  }

  test("dropNearDuplicates keeps one representative per cluster + all unpaired") {
    import graft.operators.Dedup
    // 1,2,3 near-identical (one token varies); 4 unrelated; 5 unrelated
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "totally different words that share nothing with the others here")
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }

  test("Snapshot.diff classifies add/remove/change/unchange; normalization-aware") {
    import graft.operators.Snapshot
    val old = Seq((1L, "same text"), (2L, "will change"), (3L, "goes away"),
      (4L, "Spaced   Out")).toDF("id", "t")
    val neu = Seq((1L, "same text"), (2L, "has changed"), (5L, "brand new"),
      (4L, "spaced out")).toDF("id", "t") // normalizes equal to old 4
    val got = Snapshot.diff(old, neu, "id", "t")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  // -------------------------------------------------- connected components

  test("connectedComponents equals union-find on a random graph; chains converge") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(11)
    val edges = (1 to 60).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
    // a 41-node path has diameter 40 > maxIter=25: plain one-hop
    // propagation could NOT converge — only the pointer-doubling
    // (O(log n) rounds) path passes this
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val gotChain = Dedup.connectedComponents(chain).as[(Long, Long)].collect()
    assert(gotChain.length == 41 && gotChain.forall(_._2 == 0L))
  }

  // ----------------------------------------------------------------- kmv

  test("KMinValues: exact below k, estimator formula at k, partition-invariant") {
    val hashes = (1 to 500).map(i => s"u$i").toDF("id")
      .select(Splits.portableHash($"id", "kmv").as("h")).as[Long].collect().toSeq
    // below k: exact distinct count (duplicates collapse)
    val small = (hashes.take(10) ++ hashes.take(10)).toDF("h")
    val gotSmall = small.agg(KMinValues.kmvDistinct($"h", 64)).as[Double].head()
    assert(gotSmall == 10.0)
    // at/above k: (k-1)*2^60/h_k with h_k the kth smallest distinct hash
    val k = 64
    val expected = (k - 1).toDouble * (1L << 60).toDouble / hashes.sorted.apply(k - 1).toDouble
    for (parts <- Seq(1, 7)) {
      val got = hashes.toDF("h").repartition(parts)
        .agg(KMinValues.kmvDistinct($"h", k)).as[Double].head()
      assert(got == expected, s"parts=$parts")
    }
    // sanity: the estimate is in the right ballpark for 500 distinct
    assert(expected > 300 && expected < 800)
  }

  // -------------------------------------------------------------- splits

  test("Splits.assign: deterministic, weights respected, sample is a subset") {
    val ids = (1L to 2000L).toDF("id")
    val s1 = Splits.withSplit(ids, "id").groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(s1.keySet == Set("train", "val", "test"))
    // hash buckets approximate the 80/10/10 weights
    assert(s1("train") > 1500 && s1("val") > 120 && s1("test") > 120)
    assert(s1.values.sum == 2000)
    // same ids, same assignment (pure function)
    val s2 = Splits.withSplit(ids, "id").groupBy($"split").count()
      .as[(String, Long)].collect().toMap
    assert(s1 == s2)
    // deterministic sample: stable subset, disjoint salts decorrelate
    val kept = Splits.deterministicSample(ids, "id", keep = 10)
      .as[Long].collect().toSet
    assert(kept.nonEmpty && kept.size < 400)
    val kept2 = Splits.deterministicSample(ids, "id", keep = 10).as[Long].collect().toSet
    assert(kept == kept2)
  }

  test("leakageSafeSplit: near-dup families co-assigned, singletons match assign") {
    val ids = (1L to 200L).toDF("id")
    // two near-dup families {1,2,3} and {10,11}; everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Splits.leakageSafeSplit(ids, "id", pairs)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 200)
    // family members share cluster AND split — no straddling possible
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(1L)._1 == 1L)
    assert(Set(got(10L), got(11L)).size == 1)
    // singletons assign exactly as the row-hash split (same salt + hash)
    val naive = Splits.withSplit(ids, "id")
      .as[(Long, String)].collect().toMap
    (1L to 200L).filterNot(Set(1L, 2L, 3L, 10L, 11L)).foreach { i =>
      assert(got(i) == ((i, naive(i))), s"singleton $i diverged")
    }
  }

  test("stratifiedSample: per-stratum rates, stable membership, default 0 drops") {
    val rows = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    val df = rows.toDF("id", "s")
    val got = Splits.stratifiedSample(df, "id", "s", Map("a" -> 60, "b" -> 10))
      .as[(Long, String)].collect()
    val byStrata = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byStrata.getOrElse("c", 0) == 0)              // default keep = 0
    assert(byStrata("a") > 500 && byStrata("a") < 700)   // ~60% of 1000
    assert(byStrata("b") > 50 && byStrata("b") < 170)    // ~10% of 1000
    // permanence: same rows selected on a re-run over a superset
    val bigger = (1L to 4000L).map(i => (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    val again = Splits.stratifiedSample(bigger.toDF("id", "s"), "id", "s",
        Map("a" -> 60, "b" -> 10))
      .filter($"id" <= 3000).as[(Long, String)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("Bloom: no false negatives, disjoint values mostly pruned") {
    import graft.operators.Bloom
    val members = (1L to 100L).map(i => s"in_$i")
    val outsiders = (1L to 400L).map(i => s"out_$i")
    val bloom = Bloom.build(members.toDF("v"), col("v"), words = 256, k = 3)
    val cand = (members ++ outsiders).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val kept = Bloom.mightContain(cand, "id", col("v"), bloom, words = 256, k = 3)
      .select($"v").as[String].collect().toSet
    assert(members.forall(kept.contains), "a true member was dropped")
    // 256 words * 64 bits for 100 values at k=3 -> fpr well under 1%
    assert((kept -- members.toSet).size < 20,
      s"pruning too weak: ${(kept -- members.toSet).size} of 400 outsiders kept")
  }

  // --------------------------------------------------------------- tf-idf

  test("TfIdf.topTerms: hand-computed scores and ranks") {
    val docs = Seq(
      (1L, "apple apple banana shared"),
      (2L, "banana cherry shared"),
      (3L, "cherry date shared")).toDF("id", "text")
    val got = TfIdf.topTerms(docs, "id", "text", topK = 2)
      .select($"doc_id", $"rank", $"term", $"score")
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq).toMap
    // Spark's ln is StrictMath.log (fdlibm), not Math.log — they can
    // differ by an ulp on some inputs (and do on ln(3))
    val ln3 = StrictMath.log(3.0)        // df=1 terms
    val ln15 = StrictMath.log(3.0 / 2.0) // df=2 terms
    // doc1: apple tf=2 df=1 -> 2ln3; banana tf=1 df=2 -> ln1.5; shared -> 0
    assert(got(1L) == Seq(("apple", 2 * ln3), ("banana", ln15)))
    // doc2: banana/cherry both ln1.5 -> tie broken by term asc
    assert(got(2L) == Seq(("banana", ln15), ("cherry", ln15)))
    assert(got(3L) == Seq(("date", ln3), ("cherry", ln15)))
  }

  // -------------------------------------------------------------- k-means

  test("kMeansCentroids separates planted direction clusters") {
    import graft.operators.Similarity
    // even ids point along axis 0, odd ids along axis 1 (deterministic
    // per-id jitter); seeds = ids 0 and 1 — one per planted cluster
    val vecs = (0 until 40).map { i =>
      val j = 0.01f * (i % 5)
      if (i % 2 == 0) (i.toLong, Seq(1f + j, j, 0.1f * (i % 3), 0f))
      else (i.toLong, Seq(j, 1f + j, 0f, 0.1f * (i % 3)))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val trained = Similarity.kMeansCentroids(df, "vec_id", "embedding",
      k = 2, iters = 3)
    assert(trained.map(_._1) == IndexedSeq(0L, 1L))
    val Seq(c0, c1) = trained.map(_._2).toSeq
    // each trained centroid points along its cluster's axis
    assert(c0(0) > 0.9f && c0(1) < 0.1f)
    assert(c1(1) > 0.9f && c1(0) < 0.1f)
    // one more step reproduces balanced, stable cells
    val cells = Similarity.kMeansStep(df, "vec_id", "embedding", trained)
      .select($"cell", $"n").as[(Long, Long)].collect().toMap
    assert(cells == Map(0L -> 20L, 1L -> 20L))
    // the trained model plugs into the index: querying with vector 6's
    // own embedding through 1-probe IVF must return it first (its cell
    // is probed, exact re-rank puts the identical vector on top)
    val query = df.filter($"vec_id" === 6L).select($"embedding")
    val top = Similarity.ivfTopK(df, "vec_id", "embedding", query, k = 3,
        nProbe = 1, centroids = Some(trained))
      .select($"vec_id").as[Long].head()
    assert(top == 6L)
  }

  // ------------------------------------------------------------ quantiles

  test("Quantiles.winsorized clips exactly into the per-group [p1,p99] range") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val w = Quantiles.winsorized(df, "g", "v", 0.01, 0.99)
      .select($"v", $"v_w").as[(Double, Double)].collect().toMap
    // rank p*(n-1): p1 = 1 + 0.99*(2-1) = 1.99; p99 = 99 + 0.01*(100-99)
    assert(w(1.0) == 1.99 && w(2.0) == 2.0)
    assert(w(100.0) == 99.01 && w(99.0) == 99.0)
    assert(w(50.0) == 50.0)
    // nulls stay null (greatest/least skip nulls — an unguarded clip
    // would fabricate the upper bound)
    val withNull = df.union(Seq(("g", Option.empty[Double])).toDF("g", "v"))
    val nullRow = Quantiles.winsorized(withNull, "g", "v", 0.01, 0.99)
      .filter($"v".isNull).select($"v_w").as[Option[Double]].collect()
    assert(nullRow.toSeq == Seq(None))
  }

  test("Quantiles: exact interpolates; approx within rank tolerance of exact") {
    val df = (1 to 101).map(i => ("g", i.toDouble)).toDF("g", "v")
    val ex = Quantiles.exact(df, "g", "v", Seq(0.5, 0.9)).as[(String, Double, Double)].head()
    assert(ex == (("g", 51.0, 91.0))) // rank p*(n-1) lands on integers here
    val frac = Quantiles.exact(df.limit(100), "g", "v", Seq(0.5))
      .as[(String, Double)].head()._2
    assert(frac == 50.5) // interpolated between 50 and 51
    val ap = Quantiles.approx(df, "g", "v", Seq(0.5, 0.9), accuracy = 10000)
      .as[(String, Double, Double)].head()
    assert(math.abs(ap._2 - 51.0) <= 1.0 && math.abs(ap._3 - 91.0) <= 1.0)
  }

  test("Quantiles.sampled: k>=n is exact type-1; sample tracks exact; merges") {
    // when k covers the whole group the "sample" is the group, so the
    // type-1 quantile is exact: rank ceil(p*m) in value order
    val df = (1 to 100).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val full = Quantiles.sampled(df, "g", "v", "id", k = 100,
        ps = Seq(0.5, 0.9)).as[(String, Long, Double, Double)].head()
    assert(full == (("g", 100L, 50.0, 90.0)))
    // a 64-of-1000 sample lands within the O(1/sqrt(k)) band of exact
    val big = (1 to 1000).map(i => ("g", i.toDouble, i.toLong)).toDF("g", "v", "id")
    val s = Quantiles.sampled(big, "g", "v", "id", k = 64, ps = Seq(0.5))
      .as[(String, Long, Double)].head()
    assert(s._2 == 64L && math.abs(s._3 - 500.0) < 200.0, s"got $s")
    // deterministic under repartition (hash sample, total-order ranks)
    val again = Quantiles.sampled(big.repartition(7), "g", "v", "id",
        k = 64, ps = Seq(0.5)).as[(String, Long, Double)].head()
    assert(again == s)
    // mergeability: running the sampler over the CONCATENATED per-shard
    // bottom-64 samples reproduces the full-corpus answer exactly —
    // bottom-k of a union is the bottom-k of the bottom-ks (the
    // t-digest merge story with engine-portable state)
    import graft.functions.TextFns
    def bottomK(shard: org.apache.spark.sql.DataFrame) = shard
      .withColumn("__h", TextFns.md5Hash60(concat(lit("squant:"), $"id")))
      .orderBy($"__h", $"id").limit(64).drop("__h")
    val merged = bottomK(big.filter($"id" % 2 === 0))
      .unionByName(bottomK(big.filter($"id" % 2 =!= 0)))
    val kOfShards = Quantiles.sampled(merged, "g", "v", "id", k = 64,
        ps = Seq(0.5)).as[(String, Long, Double)].head()
    assert(kOfShards == s)
    // the bottom-k filter plans as WindowGroupLimit (map-side partial
    // top-k), never a full-group sort buffer
    val plan = Quantiles.sampled(big, "g", "v", "id", k = 64, ps = Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"bottom-k sample must plan as WindowGroupLimit:\n$plan")
  }

  test("Layout.withZValue: hand-computed Morton interleave; nulls and degenerates") {
    import graft.operators.Layout
    // 2 cols, 2 bits: min-max over {0..3} quantizes to identity, so the
    // z-value is the textbook bit interleave (x at even, y at odd bits)
    val df = Seq((0, 0, 0), (1, 3, 0), (2, 0, 3), (3, 3, 3), (4, 1, 2))
      .toDF("id", "x", "y")
    val got = Layout.withZValue(df, Seq("x", "y"), bits = 2)
      .orderBy("id").select(col("id"), col("z_value"))
      .as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 0L), (1, 5L), (2, 10L), (3, 15L), (4, 9L)))
    // constant column carries no bits; null key -> null z
    val dg = Layout.withZValue(
        Seq((1, 7, Some(2.0)), (2, 7, None)).toDF("id", "c", "v"),
        Seq("c", "v"), bits = 4)
      .orderBy("id").select(col("z_value")).collect()
    assert(dg(0).getLong(0) >= 0L)
    assert(dg(1).isNullAt(0))
    // contract checks
    intercept[IllegalArgumentException] {
      Layout.withZValue(df, Seq("x", "y"), bits = 40) // 80 bits > 62
    }
    intercept[IllegalArgumentException] {
      Layout.withZValue(df.withColumn("z_value", lit(1)), Seq("x"))
    }
  }

  test("Dedup.pageRank: rank mass conserved, hub outranks leaves") {
    import graft.operators.Dedup
    // star: 1 connected to 2,3,4; plus an isolated pair 5-6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val got = Dedup.pageRank(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == 6)
    // hub has degree 3 and the highest rank; leaves are symmetric
    assert(got(1L)._1 == 3L)
    assert(got(2L) == got(3L) && got(3L) == got(4L))
    assert(got(1L)._2 > got(2L)._2)
    // the 5-6 pair is symmetric at 1/n stationary rank
    assert(got(5L) == got(6L))
    // total mass ≈ 1 (rounded ranks)
    val mass = got.values.map(_._2).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
    // determinism under repartition
    val again = Dedup.pageRank(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    got.foreach { case (id, (_, r)) => assert(again(id) == r) }
  }

  test("CusumFold kernel: zero seed, reset at zero, sign, empty array") {
    import graft.expressions.CusumFold
    val df = Seq(Tuple1(Seq(5.0, 5.0, 1.0, 5.0))).toDF("vals")
    // offset 4, sign +1: 0→1→2→max(0,-1)=0→1
    val hi = df.select(CusumFold(col("vals"), lit(4.0), 1)).head.getDouble(0)
    assert(hi == 1.0)
    // sign -1, offset -4 (≡ target 4, slack 0): 0→max(0,-1)… drops →
    // 0→0→3→max(0,3-1)=2
    val lo = df.select(CusumFold(col("vals"), lit(-4.0), -1)).head.getDouble(0)
    assert(lo == 2.0)
    val empty = Seq(Tuple1(Seq.empty[Double])).toDF("vals")
      .select(CusumFold(col("vals"), lit(1.0), 1)).head.getDouble(0)
    assert(empty == 0.0)
  }

  test("TimeSeries.cusum: sustained shift alarms, stable series does not") {
    import java.sql.Timestamp
    import graft.operators.TimeSeries
    def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    // series "s": median 10, a late sustained +3 shift over 8 points
    val base = (1 to 20).map(i => ("s", t(i), i.toLong, 10.0 + (i % 3) * 0.5))
    val drift = (21 to 28).map(i => ("s", t(i), i.toLong, 13.0 + (i % 3) * 0.5))
    val ev = (base ++ drift)
      .toDF("k", "ts", "id", "v")
    val got = TimeSeries.cusum(ev, "k", "ts", "id", "v", window = 16)
      .collect().map(r => r.getLong(1) -> ((r.getDouble(3), r.getBoolean(6))))
      .toMap
    // early stable rows: no alarm
    assert(!got(10L)._2 && !got(20L)._2)
    // by the end of the sustained shift the upper sum has accumulated
    assert(got(28L)._1 > got(21L)._1)
    assert(got(28L)._2, s"sustained shift must alarm; got ${got(28L)}")
  }

  test("Sessionize.funnel: strict ordering, partial stages, stage_reached") {
    import graft.operators.Sessionize
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "signup", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: purchase BEFORE the click → stage 2 only
      (2L, "signup", 10L), (2L, "purchase", 15L), (2L, "click", 20L),
      // user 3: click before signup doesn't count; no click after
      (3L, "click", 5L), (3L, "signup", 10L),
      // user 4: never signed up
      (4L, "click", 10L), (4L, "purchase", 20L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = Sessionize.funnel(ev, "user_id", "event_type", "ts_us",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getLong(4)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(got(2L) == ((Some(10L), Some(20L), None, 2L)))
    assert(got(3L) == ((Some(10L), None, None, 1L)))
    assert(got(4L) == ((None, None, None, 0L)))
  }

  test("Sessionize.cohortRetention: triangle counts, pre-anchor excluded") {
    import java.sql.Timestamp
    import graft.operators.Sessionize
    def t(day: Int, h: Int = 12) =
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val ev = Seq(
      // user 1 signs up day 1, active days 1, 2 (twice), 4
      (1L, "signup", t(1)), (1L, "view", t(2)), (1L, "click", t(2, 14)),
      (1L, "view", t(4)),
      // user 2 signs up day 2, active day 2 and 3; PRE-anchor day 1 view
      (2L, "view", t(1)), (2L, "signup", t(2)), (2L, "view", t(3)),
      // user 3 never signs up → no cohort
      (3L, "view", t(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Sessionize.cohortRetention(ev, "user_id", "ts",
        col("event_type") === "signup")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("Quantiles.madOutliers: flags the tail, skips mad=0 groups") {
    import graft.operators.Quantiles
    val df = Seq(
      ("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0), ("g", 4L, 4.0),
      ("g", 5L, 100.0),              // med 3, mad 1 → rob_z = 65.4265
      ("z", 6L, 5.0), ("z", 7L, 5.0), ("z", 8L, 5.0), ("z", 9L, 9.0)
    ).toDF("k", "id", "v")           // z: med 5, mad 0 → group skipped
    val got = Quantiles.madOutliers(df, "k", "v")
      .select("id", "med", "mad", "rob_z").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 5L)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 1.0)
    assert(math.abs(r.getDouble(3) - 0.6745 * 97) < 1e-6)
  }

  test("Sketch.heavyHitters: one-sided report, audit columns, phi sweep") {
    import graft.operators.Sketch
    // "a" ×6, "b" ×3, "c" ×1 → N = 10
    val terms = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("term")
    val hh = Sketch.heavyHitters(terms, "term", phi = 0.3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // threshold ceil(3.0) = 3: a and b qualify (2048-wide sketch, 3
    // terms → no collisions, est == exact), c (1 < 3) cannot
    assert(hh.keySet == Set("a", "b"))
    assert(hh("a") == ((6L, 6L, 0L)) && hh("b") == ((3L, 3L, 0L)))
    // phi above every frequency → empty report
    assert(Sketch.heavyHitters(terms, "term", phi = 0.7).count() == 0)
    // guarantee on real data: every truly phi-frequent term is reported
    val corpus = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
    val n = corpus.count()
    val trueHeavy = corpus.groupBy("term").agg(count(lit(1)).as("n"))
      .filter(col("n") >= math.ceil(0.005 * n))
    val reported = Sketch.heavyHitters(corpus, "term", phi = 0.005)
      .select(col("term"))
    assert(trueHeavy.select("term").except(reported).count() == 0)
  }

  test("Sketch: CMS estimates are one-sided; shard sketches merge linearly") {
    import graft.operators.Sketch
    val terms = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term"))
    val sk = Sketch.countMin(terms, "term")
    // bounded by construction
    assert(sk.count() <= 4L * 2048L)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
    val est = Sketch.cmsEstimate(sk, exact, "term")
      .join(exact, "term").select(col("cms_est"), col("n"))
      .as[(Long, Long)].collect()
    assert(est.nonEmpty)
    // the CMS guarantee: never an underestimate
    est.foreach { case (e, n) => assert(e >= n, s"estimate $e < exact $n") }
    // unseen terms read empty cells (or collided ones — still >= 0)
    val unseen = Seq("zzz_not_in_corpus").toDF("term")
    val u = Sketch.cmsEstimate(sk, unseen, "term").as[(String, Long)].head()
    assert(u._2 >= 0L)
    // linearity: per-source shard sketches summed == whole-corpus sketch
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
    val shards = Seq("src0", "src1").map(s =>
      Sketch.countMin(docs.filter(col("source") === s)
        .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term")),
        "term"))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("row", "bucket").agg(sum(col("c")).as("c"))
    val whole = Sketch.countMin(docs
      .filter(col("source").isin("src0", "src1"))
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("term")),
      "term")
    assert(merged.join(whole, Seq("row", "bucket"), "full")
      .filter(merged("c") =!= whole("c") ||
        merged("c").isNull || whole("c").isNull)
      .isEmpty)
  }

  // --------------------------------------------------------------- EWMA

  test("TimeSeries.ewmaSmooth recursive fold, trailing frame, tiebreak") {
    val ev = Seq(
      // key A, ordered by ts: values 1, 2, 4 (window 2)
      (1L, 10L, ts(1000000L), 1.0),
      (1L, 11L, ts(2000000L), 2.0),
      (1L, 12L, ts(3000000L), 4.0),
      // key B: ts tie broken by event_id (20 before 21)
      (2L, 21L, ts(1000000L), 8.0),
      (2L, 20L, ts(1000000L), 0.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = graft.operators.TimeSeries.ewmaSmooth(
        ev, "user_id", "ts", "event_id", "value", alpha = 0.5, window = 2)
      .select($"event_id", $"ewma", $"deviation")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // A: [1] -> 1; [1,2] -> .5*2+.5*1 = 1.5; frame slides to [2,4] -> 3.0
    assert(got(10L) == (1.0, 0.0))
    assert(got(11L) == (1.5, 0.5))
    assert(got(12L) == (3.0, 1.0))
    // B: frame order is (ts, event_id) so 20 seeds, 21 folds over [0, 8]
    assert(got(20L) == (0.0, 0.0))
    assert(got(21L) == (4.0, 4.0))
  }

  test("ewmaSmooth window=1 degenerates to the identity (ewma == value)") {
    val ev = graft.sources.Tables.events(spark, sf)
    val bad = graft.operators.TimeSeries.ewmaSmooth(
        ev, "user_id", "ts", "event_id", "value", alpha = 0.3, window = 1)
      .filter($"ewma" =!= $"value" || $"deviation" =!= 0.0)
    assert(bad.isEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.ewmaSmooth(
        ev, "user_id", "ts", "event_id", "value", alpha = 0.0, window = 4)
    }
    intercept[IllegalArgumentException] {
      graft.operators.TimeSeries.ewmaSmooth(
        ev, "user_id", "ts", "event_id", "value", alpha = 0.3, window = 0)
    }
  }
}
