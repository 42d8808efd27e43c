package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftnative.CmsSketch

/** Corpus-frequency heavy hitters over word n-grams — the "which exact
  * phrases saturate this crawl" question behind boilerplate lists, spam
  * signatures, and stop-phrase tables. Result is EXACT: every n-gram whose
  * total occurrence count across the corpus is >= `minCount`, with its
  * count.
  *
  * Shape at scale (the reason this is not just `groupBy(gram).count()`):
  * n-gram frequency is Zipfian — at 100 TB the overwhelming majority of
  * distinct n-grams occur a handful of times, and a direct count shuffles
  * that entire long tail only to discard it. Instead:
  *
  *   pass 1: build a count-min sketch over `xxhash64(gram)` — partial
  *     counter matrices merged by elementwise add, one binary row out, the
  *     scan itself exchange-free;
  *   pass 2: re-derive the grams (re-scanning text is the scale-correct
  *     choice — persisting an exploded 100 TB gram stream is not a thing)
  *     and drop MAP-SIDE every gram whose estimate is < minCount. Count-min
  *     estimates never undercount (collisions only add), so no true heavy
  *     hitter is lost; only the ~eps·N-bounded candidate set pays the
  *     exact-count shuffle, and the final HAVING removes the sketch's
  *     overestimates. Identical to the exact result by construction —
  *     which is why the driver gates it against the plain DuckDB
  *     occurrence-count oracle.
  *
  * A 64-bit gram-hash collision could promote a rare gram into the
  * candidate set (conservative direction — the exact confirm then sees its
  * true count); it cannot evict a heavy hitter.
  */
object HeavyHitters {

  def ngrams(
      df: DataFrame,
      textCol: String = "text",
      n: Int = 2,
      minCount: Long = 100,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minCount > 0, s"minCount must be positive, got $minCount")
    def grams(frame: DataFrame): DataFrame = frame
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(TextFunctions.shinglesFromTokens(col("__toks"), n)).as("gram"))
    val sketch = grams(df)
      .agg(CmsSketch.cmsAgg(xxhash64(col("gram")), eps, confidence, seed).as("__cms"))
      .head.getAs[Array[Byte]](0)
    val out = grams(df)
    // Empty corpus: the aggregate yields NULL — no gram can qualify.
    val candidates =
      if (sketch == null) out.filter(lit(false))
      else out.filter(CmsSketch.estimate(sketch, xxhash64(col("gram"))) >= minCount)
    candidates
      .groupBy("gram")
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
  }

  /** Corpus-frequency stopword removal: strip every occurrence of the
    * corpus's `k` most frequent tokens ([[vocab]]'s head — the data-driven
    * stopword list, which adapts to the corpus language/domain where a
    * fixed English list cannot) and rejoin each document's survivors in
    * order. Documents reduced to nothing come back as '' (the scrub
    * contract). The k-row list broadcasts; the reassembly grouping is the
    * only shuffle, paid after the highest-frequency tokens — by
    * definition the volume — are anti-joined away.
    */
  /** ONE tokenize pass shared by the vocab side and the positional side
    * of [[stripTopTokens]] / [[tokenIds]] (guide §2.4 — each previously
    * tokenized the corpus twice): (id, __tk tokens, __ne text-non-empty).
    * The __ne flag preserves the positional side's `length(text) > 0`
    * filter exactly — an empty-but-non-null text tokenizes to [''] and
    * must feed the VOCAB counts (it always did) while staying out of the
    * positional stream (it always was).
    */
  private def tokenArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.util.CacheScope.persist(docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__tk"),
        (length(col(textCol)) > 0).as("__ne")))

  /** [[vocab]] over an already-exploded (token) frame. */
  private def vocabFromTokens(tokens: DataFrame, size: Int): DataFrame = {
    require(size > 0, s"vocab size must be positive, got $size")
    tokens
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(size)
      .coalesce(1)
      .sortWithinPartitions(col("freq").desc, col("token"))
      .select(
        monotonically_increasing_id().as("token_id"),
        col("token"), col("freq"))
  }

  def stripTopTokens(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 100): DataFrame = {
    val arr = tokenArrays(docs, idCol, textCol)
    val stop = vocabFromTokens(
      arr.select(explode(col("__tk")).as("token")), k).select("token")
    val toks = arr.filter(col("__ne"))
      .select(col("id"), posexplode(col("__tk")).as(Seq("pos", "tok")))
    val kept = toks.join(broadcast(stop), toks("tok") === stop("token"), "left_anti")
    val rejoined = kept
      .groupBy(col("id").as(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as(textCol))
    docs.select(col(idCol))
      .join(rejoined, Seq(idCol), "left_outer")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** The tokenizer handoff: every document as its id sequence under the
    * corpus [[vocab]] — token i of the text becomes element i of
    * `token_ids`, out-of-vocabulary tokens become `unkId`. One broadcast
    * of the V-row vocab against the exploded token stream, then an
    * in-order re-collect per document; empty docs come back as an empty
    * array. (Emitted as JSON text by the registered query only because
    * the driver's hash gate cannot sort array cells — the operator
    * itself returns the typed array.)
    */
  def tokenIds(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      vocabSize: Int = 32768,
      unkId: Long = -1L): DataFrame = {
    val arr = tokenArrays(docs, idCol, textCol)
    val v = vocabFromTokens(
      arr.select(explode(col("__tk")).as("token")), vocabSize)
      .select("token", "token_id")
    val toks = arr.filter(col("__ne"))
      .select(col("id"), posexplode(col("__tk")).as(Seq("pos", "tok")))
    val mapped = toks
      .join(broadcast(v), toks("tok") === v("token"), "left_outer")
      .select(col("id"), col("pos"),
        coalesce(col("token_id"), lit(unkId)).as("tid"))
    val seqs = mapped
      .groupBy(col("id").as(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("tid")))),
        x => x.getField("tid")).as("token_ids"))
    docs.select(col(idCol))
      .join(seqs, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("token_ids"), array().cast("array<bigint>")).as("token_ids"))
  }

  /** Frequency-ranked vocabulary: the top `size` tokens by (count desc,
    * token asc) with contiguous ids 0..size-1 — the "init the tokenizer
    * vocab from corpus statistics" step. The global top-V is a
    * TakeOrdered (size is bounded and small — thousands — so the ordered
    * take never materializes the full count table on one task); the V
    * winners then number themselves in one partition, the same
    * deterministic single-partition trick as the IVF centroid pick.
    */
  def vocab(df: DataFrame, textCol: String = "text", size: Int = 32768): DataFrame =
    vocabFromTokens(
      df.select(explode(TextFunctions.tokens(col(textCol))).as("token")), size)
}
