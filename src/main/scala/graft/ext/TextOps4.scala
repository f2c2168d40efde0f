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

  // Token → bucket is the cross-engine md5-hex-slice recipe (t14), and
  // bucket → weight the Knuth multiplicative mix in [-500, 500]; both now
  // live inside the Md5BucketSum kernel (weights pre-tabulated below).

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

  /** The 64 bucket weights as a plan literal: `weight` is a pure function
    * of the bucket id, so the whole model tabulates up front and the
    * per-token work collapses to one memoized hash + array index inside
    * [[graft.functions.Md5BucketSum]] (the learned-model deployment
    * shape: weights broadcast as a literal, never recomputed per token). */
  private val FeatWeights: Array[Long] =
    Array.tabulate(FeatDim)(b => (b.toLong * 2654435761L) % 1001L - 500L)

  /** The t50 scorer as a stateless projection over any (doc_id, text)
    * relation — shared verbatim by the batch gate above, t52's bucketing
    * and the streaming twin ([[graft.streaming.Streams.scoredDocuments]]),
    * so all paths score with the identical kernel. One codegen'd call per
    * document ([[graft.functions.Md5BucketSum]]) replaces the interpreted
    * per-token HOF lambda that dominated t50/t52's wall clock. */
  private[graft] def scoreOf(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.Md5BucketSum.graft_md5_bucket_sum(
          col("text"), "feat:", FeatDim, FeatWeights).as("score_raw"))
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("score_raw").desc, col("doc_id"))
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        graft.functions.Md5BucketSum.graft_md5_bucket_sum(
          col("text"), "feat:", FeatDim, FeatWeights).as("score_raw"))
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

  // --- t54: BPE tokenizer apply (fertility report) ----------------------

  /** t54: apply the t47-trained BPE merge table to the whole corpus — the
    * inference half of tokenizer training (Sennrich et al. 2016), and the
    * pass a data pipeline runs to budget token counts per slice: every
    * word char-splits and replays the merges IN TRAINING ORDER, and the
    * report is per-language token mass and fertility (tokens per word,
    * ppm) — the metric that decides whether a tokenizer fits a corpus
    * slice.
    *
    * Plan shape (the t45 canon discipline): the merge chain runs on
    * DISTINCT words only — one narrow projection whose 6 chained
    * `replace` calls stay inside whole-stage codegen — and word
    * instances join the per-word token count back by word (equi-shuffle
    * on the word key), then roll up per language map-side. The model
    * itself is a driver memo ([[graft.ext.TextOps3.bpeMerges]] — KB-sized
    * like any deployed tokenizer's merge file). At 100 TB the distinct
    * vocabulary is millions of rows against trillions of instances: the
    * corpus pays one scan for (lang, word) counts and one vocabulary-
    * sized tokenization, never a per-instance merge replay. */
  def t54BpeApply(s: SparkSession, dir: String): DataFrame = {
    val merges = TextOps3.bpeMerges(s, dir)
    val wf = graft.ops.Par.fanOut(documents(s, dir), "doc_id")
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("n"))
    val seg0 = concat(lit(" "),
      regexp_replace(col("word"), "(.)", "$1 "))
    val segN = merges.foldLeft(seg0) { case (seg, (a, b)) =>
      org.apache.spark.sql.functions.replace(
        seg, lit(s" $a $b "), lit(s" $a$b "))
    }
    val tok = wf.select(col("word")).distinct()
      .select(col("word"),
        size(split(trim(segN), " ")).cast("long").as("k"))
    wf.join(tok, "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_distinct_words"),
        sum(col("n")).as("n_words"),
        sum(col("n") * col("k")).as("n_tokens"))
      .select(col("lang"), col("n_distinct_words"), col("n_words"),
        col("n_tokens"),
        expr("1000000 * n_tokens div n_words").as("fertility_ppm"))
      .sortedSmall("lang")
  }

  /** Replays t47's training chain (same stage text: corpus word
    * frequencies → char split → [[graft.ext.TextOps3.BpeRounds]]
    * argmax-merge stages) and then the apply over distinct words joined
    * back to per-language instance counts. */
  val t54Oracle: String = {
    val rounds = TextOps3.BpeRounds
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT t[i] AS a, t[i + 1] AS b, f FROM (
         |    SELECT f, string_split(trim(seg), ' ') AS t,
         |      unnest(range(1, len(string_split(trim(seg), ' ')))) AS i
         |    FROM s${r - 1})),
         |b$r AS (
         |  SELECT a, b, CAST(SUM(f) AS BIGINT) AS total
         |  FROM p$r GROUP BY a, b
         |  ORDER BY total DESC, a, b LIMIT 1),
         |s$r AS (
         |  SELECT f, replace(seg, ' ' || b$r.a || ' ' || b$r.b || ' ',
         |    ' ' || b$r.a || b$r.b || ' ') AS seg
         |  FROM s${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    val applyStages = (1 to rounds).map { r =>
      s"""a$r AS (
         |  SELECT word, replace(seg, ' ' || b$r.a || ' ' || b$r.b || ' ',
         |    ' ' || b$r.a || b$r.b || ' ') AS seg
         |  FROM a${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH wfl AS (
       |  SELECT lang, word, COUNT(*) AS n FROM (
       |    SELECT lang, unnest(string_split(text, ' ')) AS word
       |    FROM documents)
       |  GROUP BY lang, word),
       |wf AS (
       |  SELECT word, CAST(SUM(n) AS BIGINT) AS f FROM wfl GROUP BY word),
       |s0 AS (
       |  SELECT f, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg
       |  FROM wf),
       |$stages,
       |a0 AS (
       |  SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seg
       |  FROM (SELECT DISTINCT word FROM wfl)),
       |$applyStages,
       |tok AS (
       |  SELECT word, CAST(len(string_split(trim(seg), ' ')) AS BIGINT) AS k
       |  FROM a$rounds)
       |SELECT lang, COUNT(*) AS n_distinct_words,
       |  CAST(SUM(n) AS BIGINT) AS n_words,
       |  CAST(SUM(n * k) AS BIGINT) AS n_tokens,
       |  (1000000 * CAST(SUM(n * k) AS BIGINT)) // CAST(SUM(n) AS BIGINT)
       |    AS fertility_ppm
       |FROM wfl JOIN tok USING (word)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  // --- t55: DSIR-style importance selection -----------------------------

  /** Hashed-bucket dimension for the two n-gram distributions. */
  private val DsirDim = 128

  private def dsirBucket(tok: Column): Column =
    conv(substring(graft_md5(concat(lit("dsir:"), tok)), 1, 8), 16, 10)
      .cast("long") % DsirDim

  /** Per-corpus driver memo of the trained DSIR model: the 128 bucket
    * weights plus the corpus target-share threshold — KB-sized by
    * construction (the wpModel/codebook discipline; same identical-
    * rebuild assumption, documented there). */
  private val dsirModel = new java.util.concurrent.ConcurrentHashMap[
    String, (Array[Long], Long)]()

  /** t55: importance-resampling data selection in the style of DSIR (Xie
    * et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): estimate target-domain and raw-corpus unigram
    * distributions over hashed feature buckets, weight each bucket by
    * the smoothed target/raw ratio (ppm, integer floor division), score
    * every document by its mean token-bucket weight, and keep documents
    * scoring above the corpus target share — "more target-like than the
    * corpus average". The target domain here is the English slice
    * (lang = 'en'), standing in for DSIR's Wikipedia target.
    *
    * Plan shape: training is ONE corpus scan (explode → 128-row
    * conditional aggregate — map-side combinable into a bounded result),
    * memoized per corpus as a driver artifact like every other KB-sized
    * model; the apply is ONE narrow projection — the bucket weights ride
    * into the plan as a literal array and `aggregate` folds the token
    * array per document (the t50 shape: no explode, no shuffle before
    * the output sort). At 100 TB both passes are pure scans. */
  def t55DsirSelect(s: SparkSession, dir: String): DataFrame = {
    val (weights, sharePpm) = dsirModel.computeIfAbsent(dir, _ => {
      val counts = documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .select(dsirBucket(col("tok")).as("b"),
          (col("lang") === "en").cast("long").as("is_t"))
        .groupBy(col("b"))
        .agg(count(lit(1)).as("r"), sum(col("is_t")).as("t"))
        .collect()
      val w = new Array[Long](DsirDim)
      var rTot = 0L
      var tTot = 0L
      counts.foreach { row =>
        val b = row.getLong(0).toInt
        val r = row.getLong(1)
        val t = row.getLong(2)
        w(b) = 1000000L * (t + 1L) / (r + 1L)
        rTot += r
        tTot += t
      }
      // Empty buckets score the smoothed prior, same as the oracle.
      (0 until DsirDim).foreach { b => if (w(b) == 0L) w(b) = 1000000L }
      (w, 1000000L * tTot / rTot)
    })
    val toks = split(col("text"), " ")
    documents(s, dir)
      .select(col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.Md5BucketSum.graft_md5_bucket_sum(
          col("text"), "dsir:", DsirDim, weights).as("w_tot"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("w_tot div n_tokens").as("score_ppm"))
      .withColumn("kept", col("score_ppm") > lit(sharePpm))
      .sortedWide("doc_id")
  }

  val t55Oracle: String =
    s"""WITH tk AS (
       |  SELECT doc_id, lang,
       |    CAST(('0x' || substr(md5('dsir:' || tok), 1, 8)) AS BIGINT)
       |      % $DsirDim AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)),
       |m AS (
       |  SELECT b, (1000000 * (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
       |      + 1)) // (COUNT(*) + 1) AS w
       |  FROM tk GROUP BY b),
       |share AS (
       |  SELECT (1000000 * SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))
       |      // COUNT(*) AS s
       |  FROM tk),
       |ds AS (
       |  SELECT tk.doc_id, CAST(SUM(m.w) AS BIGINT) AS tot,
       |    COUNT(*) AS n_tokens
       |  FROM tk JOIN m USING (b) GROUP BY tk.doc_id)
       |SELECT d.doc_id, d.lang,
       |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  ds.tot // ds.n_tokens AS score_ppm,
       |  ds.tot // ds.n_tokens > share.s AS kept
       |FROM documents d, ds, share
       |WHERE d.doc_id = ds.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // --- t56: intra-document self-repetition spans ------------------------

  /** t56: intra-document repeated n-gram profile — for k ∈ {2, 4, 8}
    * word-grams, how much of each document is made of n-grams that occur
    * MORE THAN ONCE in that same document. This is the memorization /
    * degeneration signal at span granularity (the "repeating itself"
    * failure mode Holtzman et al. 2020 measure in generations, applied to
    * training text): t21 scores token-level repetition, t39/t48 find
    * CROSS-document shared spans; this operator finds the spans a
    * document shares with itself. Reported per (doc, k): gram positions,
    * positions covered by a repeated gram, the hottest gram's count, and
    * the repeated-mass ppm a filter would threshold on.
    *
    * Plan shape: the whole computation is DOCUMENT-LOCAL, so it runs as
    * a per-partition kernel (the m08/winnowing executor-batch shape) with
    * ZERO exchanges before the output sort — the declarative alternative
    * (explode every gram, two keyed aggregates) ships 3× the corpus token
    * count through two shuffles to compute facts each document already
    * holds locally (measured: 13.1 s → ~1 s on the 10× replica). Per-doc
    * state is one gram→count map, bounded by document length — the same
    * per-doc bound winnowing's PosBase guard (t39) already imposes
    * corpus-wide; chunk oversized docs (t19) upstream. Grams are counted
    * as exact strings, so the oracle contract needs no digest caveat. */
  def t56SelfRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.ops.Par.fanOut(documents(s, dir), "doc_id")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        Seq(2, 4, 8).filter(_ <= toks.length).map { k =>
          val m = new java.util.HashMap[String, Int]()
          val sb = new java.lang.StringBuilder
          var i = 0
          var mx = 0
          while (i + k <= toks.length) {
            sb.setLength(0)
            var j = 0
            while (j < k) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            val c = m.merge(sb.toString, 1, Integer.sum)
            if (c > mx) mx = c
            i += 1
          }
          var nPos = 0L
          var nRep = 0L
          m.values.forEach { v =>
            nPos += v
            if (v >= 2) nRep += v
          }
          RepProfile(id, k.toLong, nPos, nRep, mx.toLong)
        }
      })
      .toDF()
      .select(col("doc_id"), col("k"), col("n_pos"), col("n_rep_pos"),
        col("max_gram_n"),
        expr("1000000 * n_rep_pos div n_pos").as("rep_ppm"))
      .sortedWide("doc_id", "k")
  }

  final case class RepProfile(doc_id: Long, k: Long, n_pos: Long,
      n_rep_pos: Long, max_gram_n: Long)

  /** Groups on the raw gram text where the engine groups on its md5 —
    * same multiset (the digest discipline's standing contract). */
  val t56Oracle: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
      |           FROM documents),
      |ks AS (SELECT unnest([2, 4, 8]) AS k),
      |g AS (
      |  SELECT doc_id, k, array_to_string(t[i:i+k-1], ' ') AS gr
      |  FROM (SELECT doc_id, k, t, unnest(range(1, len(t) - k + 2)) AS i
      |        FROM d, ks WHERE len(t) >= k)),
      |c AS (SELECT doc_id, k, gr, COUNT(*) AS n FROM g GROUP BY 1, 2, 3)
      |SELECT doc_id, CAST(k AS BIGINT) AS k,
      |  CAST(SUM(n) AS BIGINT) AS n_pos,
      |  CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rep_pos,
      |  CAST(MAX(n) AS BIGINT) AS max_gram_n,
      |  (1000000 * CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT))
      |    // CAST(SUM(n) AS BIGINT) AS rep_ppm
      |FROM c GROUP BY doc_id, k ORDER BY doc_id, k""".stripMargin

  // --- t57: vocabulary concentration report ------------------------------

  /** t57: per-source vocabulary concentration — the Zipf-shape corpus
    * health report a data pipeline reads before mixing sources: token and
    * type counts, hapax share (types seen once — high hapax = rich or
    * noisy), the mass share of the top-10 tokens (high = templated or
    * degenerate text), and the number of types needed to cover half the
    * token mass (the rank-frequency curve's half-mass point — the
    * integer-exact stand-in for a fitted Zipf slope). All ratios integer
    * ppm; the half-mass rank uses (freq DESC, token ASC) ordering so the
    * boundary is engine-stable.
    *
    * Plan shape: one scan → (source, token) hash aggregate (map-side
    * combinable), then ONE source-keyed exchange where rank, cumulative
    * mass, and per-source total share a single sort (three window
    * functions, one window spec family), and a 20-row rollup. At 100 TB
    * the (source, token) aggregate bounds everything downstream by
    * vocabulary size, not corpus size. */
  def t57VocabConcentration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.ops.Par.fanOut(documents(s, dir), "doc_id")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n"))
    val bySrc = Window.partitionBy(col("source"))
    val byFreq = bySrc.orderBy(col("n").desc, col("tok"))
    counts
      .withColumn("rnk", row_number().over(byFreq).cast("long"))
      .withColumn("cum", sum(col("n"))
        .over(byFreq.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tot", sum(col("n")).over(bySrc))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("rnk") <= 10, col("n")).otherwise(0L)).as("top10"),
        min(when(col("cum") * 2 >= col("tot"), col("rnk"))).as("p50_types"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        expr("1000000 * n_hapax div n_types").as("hapax_ppm"),
        expr("1000000 * top10 div n_tokens").as("top10_share_ppm"),
        col("p50_types"))
      .sortedSmall("source")
  }

  val t57Oracle: String =
    """WITH c AS (
      |  SELECT source, tok, COUNT(*) AS n
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT source, n,
      |    CAST(row_number() OVER w AS BIGINT) AS rnk,
      |    CAST(SUM(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |                      AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS tot
      |  FROM c
      |  WINDOW w AS (PARTITION BY source ORDER BY n DESC, tok))
      |SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  COUNT(*) AS n_types,
      |  (1000000 * CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT))
      |    // COUNT(*) AS hapax_ppm,
      |  (1000000 * CAST(SUM(CASE WHEN rnk <= 10 THEN n ELSE 0 END)
      |    AS BIGINT)) // CAST(SUM(n) AS BIGINT) AS top10_share_ppm,
      |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN rnk END) AS BIGINT)
      |    AS p50_types
      |FROM r GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("t50_quality_classifier", t50QualityClassifier, Some(t50Oracle)),
    Q("t51_gopher_rules", t51GopherRules, Some(t51Oracle)),
    Q("t52_perplexity_buckets", t52PerplexityBuckets, Some(t52Oracle)),
    Q("t53_kn_lm_score", t53KnScore, Some(t53Oracle)),
    Q("t54_bpe_apply", t54BpeApply, Some(t54Oracle)),
    Q("t55_dsir_select", t55DsirSelect, Some(t55Oracle)),
    Q("t56_self_repetition", t56SelfRepetition, Some(t56Oracle)),
    Q("t57_vocab_concentration", t57VocabConcentration, Some(t57Oracle)))
}
