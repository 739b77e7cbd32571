package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BmpImage, ImageFeatures, KMinValues, MinHashSig, RollingHash, SimHashPack, SortedIntersectCount, VecDot, WordNGrams, XxHash64Array}

/** Session extension point for the engine's custom Catalyst expressions —
  * the standard injection path
  * (`spark.sql.extensions=graft.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`), so SQL-text users get
  * the native kernels too:
  *
  * {{{
  *   SELECT vec_dot(embedding, embedding) FROM embeddings  -- squared norm
  *   SELECT kmv_distinct(xxhash64(user_id), 64) FROM events -- KMV sketch
  *   SELECT word_ngrams(split(text, ' '), 3) FROM documents -- shingle build
  *   SELECT image_features(payload).width FROM media       -- BMP/PNG parse
  *   SELECT doc_id, simhash_pack(xxhash64(tok), 60)        -- SimHash sig
  *   FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents)
  *   GROUP BY doc_id
  *   SELECT minhash_sig(word_ngrams(split(text,' '),3), 64) FROM documents
  *   SELECT sorted_intersect_count(sort_array(xxhash64_array(a)),
  *                                 sort_array(xxhash64_array(b))) FROM t
  * }}}
  *
  * `kmv_distinct(hashedLong, k)` estimates hashes as uniform on
  * [0, 2^60) (the engine's portable-hash domain — see
  * `graft.functions.TextFns.md5Hash60`); pass a third literal to
  * override the domain. Full-range signed hashes like raw `xxhash64`
  * must be mapped into a NON-NEGATIVE domain first with an UNSIGNED
  * shift — `kmv_distinct(shiftrightunsigned(xxhash64(c), 4), 64)` —
  * an arithmetic `>> 4` keeps the sign and yields negative garbage
  * estimates.
  *
  * [[GraftExtensions.register]] installs the same functions into an
  * already-built session (useful when the session isn't ours to build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** All injected functions: (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, s"vec_dot expects 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }),
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_hash expects 1 argument, got ${children.size}")
        RollingHash(children.head, 7L, 31L, 1000000007L)
      }),
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KMinValues].getName, "kmv_distinct"),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          s"kmv_distinct expects (hashedLong, k[, domain]), got ${children.size} args")
        def lit(e: Expression, what: String): Long = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)  => v.toLong
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_distinct $what must be an integer literal, got $other")
        }
        val k = lit(children(1), "k").toInt
        val domain = if (children.size == 3) lit(children(2), "domain") else 1L << 60
        KMinValues(children.head, k, domain).toAggregateExpression()
      }),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"word_ngrams expects (tokenArray, n), got ${children.size} args")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer literal, got $other")
        }
        WordNGrams(children.head, n)
      }),
    (FunctionIdentifier("simhash_pack"),
      new ExpressionInfo(classOf[SimHashPack].getName, "simhash_pack"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"simhash_pack expects (hashedLong, bits), got ${children.size} args")
        val bits = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"simhash_pack bits must be an integer literal, got $other")
        }
        // returned UNWRAPPED: the analyzer's ResolveFunctions wraps a bare
        // AggregateFunction in AggregateExpression itself, wiring through
        // any DISTINCT/FILTER the SQL carried — pre-wrapping here would
        // bypass that and fail `simhash_pack(DISTINCT x, 60)` analysis
        SimHashPack(children.head, bits)
      }),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"minhash_sig expects (shingleArray, numHashes), got ${children.size} args")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig numHashes must be an integer literal, got $other")
        }
        MinHashSig(children.head, n)
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"sorted_intersect_count expects 2 arguments, got ${children.size}")
        SortedIntersectCount(children.head, children(1))
      }),
    (FunctionIdentifier("xxhash64_array"),
      new ExpressionInfo(classOf[XxHash64Array].getName, "xxhash64_array"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"xxhash64_array expects 1 argument, got ${children.size}")
        XxHash64Array(children.head)
      }),
    (FunctionIdentifier("bmp_image"),
      new ExpressionInfo(classOf[BmpImage].getName, "bmp_image"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"bmp_image expects 1 argument, got ${children.size}")
        BmpImage(children.head)
      }),
    (FunctionIdentifier("image_features"),
      new ExpressionInfo(classOf[ImageFeatures].getName, "image_features"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"image_features expects 1 argument, got ${children.size}")
        ImageFeatures(children.head)
      }),
    (FunctionIdentifier("hash_embed_vec"),
      new ExpressionInfo(classOf[graft.expressions.HashEmbedVec].getName,
        "hash_embed_vec"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"hash_embed_vec expects (tokenArray, dim), got ${children.size} args")
        val dim = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hash_embed_vec dim must be an integer literal, got $other")
        }
        graft.expressions.HashEmbedVec(children.head, dim)
      }))

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
