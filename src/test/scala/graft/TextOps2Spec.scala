package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the t19-t25 pipeline operators and e11.
  * (Exact-value parity with DuckDB is gated by Verify/check_oracle.) */
class TextOps2Spec extends AnyFunSuite {
  import TestSpark._

  test("t19 chunks tile every document: strides of 30, width <= 40, " +
    "full token coverage") {
    val d = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val chunks = ext.TextOps2.t19Chunking(spark, sf)
    val joined = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("start_token")).as("last"),
        sum(when(col("n_chunk_tokens") > 40, 1).otherwise(0)).as("oversized"))
      .join(d, "doc_id")
    // every document chunked; last chunk starts within the doc; none oversized
    assert(joined.count() == d.count())
    assert(joined.filter(col("last") >= col("n")).count() == 0)
    assert(joined.filter(col("oversized") > 0).count() == 0)
    // chunk count = ceil(n / 30)
    assert(joined.filter(col("n_chunks") =!=
      ceil(col("n").cast("double") / 30).cast("long")).count() == 0)
  }

  test("t20 scrub redacts every planted email/url and leaves no long " +
    "digit run") {
    val r = ext.TextOps2.t20PiiScrub(spark, sf)
    assert(r.filter(col("n_emails") < 1 || col("n_urls") < 1).count() == 0)
    // redacted text re-scanned: planted markers present, patterns gone —
    // only the md5 is emitted, so re-derive cleanliness from counts:
    // the planted payload contributes exactly 1 email + 1 url.
    assert(r.filter(col("n_nums") < 1).count() == 0)
  }

  test("t21 repetition ratio is in [0,1) and gram counts are consistent") {
    val r = ext.TextOps2.t21Repetition(spark, sf)
    assert(r.filter(col("n_distinct") > col("n_grams")).count() == 0)
    assert(r.filter(col("rep_ratio") < 0 || col("rep_ratio") >= 1)
      .count() == 0)
    assert(r.filter(col("max_gram_cnt") < 1).count() == 0)
  }

  test("t22 tf-idf weight is monotone in tf for fixed term") {
    val r = ext.TextOps2.t22Tfidf(spark, sf)
    // same term (same df, same N): higher tf => strictly higher weight
    val pairs = r.select(col("term"), col("tf"), col("w_milli"))
      .toDF("term", "tf_a", "w_a")
      .join(r.select(col("term"), col("tf"), col("w_milli"))
        .toDF("term", "tf_b", "w_b"), "term")
      .filter(col("tf_a") > col("tf_b") && col("w_a") <= col("w_b"))
    assert(pairs.count() == 0)
  }

  test("t23 similarity join emits each unordered pair once, above " +
    "threshold, with enough shared terms") {
    val r = ext.TextOps2.t23SimilarityJoin(spark, sf).cache()
    assert(r.filter(col("a") >= col("b")).count() == 0)
    assert(r.filter(col("cos_r") < 0.5 || col("cos_r") > 1.0001)
      .count() == 0)
    assert(r.filter(col("n_shared") < 5).count() == 0)
    assert(r.groupBy(col("a"), col("b")).count()
      .filter(col("count") > 1).count() == 0)
  }

  test("t24 incremental dedup: keepers are reference docs with " +
    "identical text") {
    val d = graft.tables.Tables.documents(spark, sf)
    val r = ext.TextOps2.t24IncrementalDedup(spark, sf)
    assert(r.filter(col("doc_id") % 10 >= 2).count() == 0) // increment only
    val bad = r.filter(col("is_dup"))
      .join(d.select(col("doc_id"), col("text")), "doc_id")
      .join(d.select(col("doc_id").as("keeper"), col("text").as("rt")),
        "keeper")
      .filter(col("text") =!= col("rt") || col("keeper") % 10 < 2)
    assert(bad.count() == 0)
  }

  test("t25 stratified sample respects per-stratum hash gate and shrinks " +
    "every stratum toward the smallest") {
    val d = graft.tables.Tables.documents(spark, sf)
    val r = ext.TextOps2.t25StratifiedSample(spark, sf).cache()
    assert(r.filter(col("hash_ppm") >= col("rate_ppm")).count() == 0)
    val minStratum = d.groupBy(col("lang")).count().agg(min("count"))
      .head().getLong(0)
    // kept counts concentrate near the smallest stratum: no stratum may
    // exceed it by more than sampling noise (hash is uniform; 5 sigma)
    val slack = minStratum + 5 * math.sqrt(minStratum.toDouble).toLong + 5
    val over = r.groupBy(col("lang")).count().filter(col("count") > slack)
    assert(over.count() == 0)
  }

  test("t26 containment: intersection bounded by set sizes, relation " +
    "consistent with the integer thresholds") {
    val r = ext.TextOps2.t26Containment(spark, sf).cache()
    assert(r.filter(col("n_both") > col("sa") ||
      col("n_both") > col("sb")).count() == 0)
    assert(r.filter(col("relation") === "duplicate" &&
      (col("n_both") * 10 < col("sa") * 9 ||
        col("n_both") * 10 < col("sb") * 9)).count() == 0)
    assert(r.filter(col("relation") === "a_in_b" &&
      col("n_both") * 10 < col("sa") * 9).count() == 0)
    assert(r.filter(col("jaccard_r") < 0 || col("jaccard_r") > 1)
      .count() == 0)
  }

  test("canonical similarity pairs agree with a naive direct computation " +
    "on a 7-fold duplicated corpus (diagonal expansion, orientation)") {
    // Duplicate every sf0.001 doc 7 times under INTERLEAVED ids (copy i
    // lives at doc_id + i·10⁵, so every group's members straddle every
    // other group's) — the regime where pair volume is quadratic in the
    // copy count and the canonical path's diagonal groups and (min, max)
    // orientation both carry weight: cross-group expanded pairs flip
    // orientation whenever a later copy of the smaller-rep group meets an
    // earlier copy of the larger-rep one. (A contiguous-block id scheme
    // like doc_id·7+i would leave the flip path silently unexercised.)
    // The reference below is the textbook direct pair join over the SAME
    // tf — no canonicalization.
    val base = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val dup = (0 until 7).map(i =>
      base.select((col("doc_id") + i * 100000).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val tf = ext.TextOps2.bigramTfOf(dup).persist()
    tf.count()
    val canonical = ext.TextOps2.simPairs(spark, tf).persist()

    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("doc_id")).as("n_docs"))
    val v = tf.join(dfq, "term").crossJoin(n)
      .filter(col("df") * 10 <= col("n_docs"))
      .select(col("doc_id"), col("term"),
        expr("tf * 1000000 div df").as("w"))
    val norms = v.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("nrm2"))
    val reference = v.toDF("a", "term", "wa")
      .join(v.toDF("b", "term", "wb"), "term")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(col("wa") * col("wb")).as("dot"))
      .join(norms.toDF("a", "na2"), "a")
      .join(norms.toDF("b", "nb2"), "b")
      .select(col("a"), col("b"), col("n_shared"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double"))), 4).as("cos_r"))
      .filter(col("n_shared") >= 5 && col("cos_r") >= 0.5)

    // the duplication must actually produce twin pairs (cos exactly 1.0):
    // at least one full group's C(7,2) internal pairs must survive the
    // n_shared >= 5 gate, or the test is vacuous
    assert(canonical.filter(col("cos_r") === 1.0).count() >= 21)
    assert(canonical.exceptAll(reference).count() == 0)
    assert(reference.exceptAll(canonical).count() == 0)
    tf.unpersist(); canonical.unpersist()
  }

  test("t26 on a 7-fold duplicated corpus matches a naive doc-level " +
    "intersection (direction-sensitive sa/sb survive orientation flips)") {
    val base = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val dup = (0 until 7).map(i =>
      base.select((col("doc_id") + i * 100000).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val tf = ext.TextOps2.bigramTfOf(dup).persist()
    tf.count()
    val out = ext.TextOps2.t26Of(spark, tf, 20000L).persist()
    // Naive reference: intersect the SAME candidate pairs at doc level
    // (candidate selection equality is covered by the simPairs test);
    // what this checks is the rep-level n_both plus the post-expansion
    // sa/sb attribution and relation classification.
    val cand = out.select(col("a"), col("b"))
    val sets = tf.select(col("doc_id"), col("term"))
    val inter = sets.toDF("b", "term")
      .join(sets.toDF("a", "term").join(cand, "a"), Seq("b", "term"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_both"))
    val sizes = sets.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val ref = inter
      .join(sizes.toDF("a", "sa"), "a")
      .join(sizes.toDF("b", "sb"), "b")
      .select(col("a"), col("b"), col("sa"), col("sb"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("sa") + col("sb") - col("n_both")), 4).as("jaccard_r"),
        when(col("n_both") * 10 >= col("sa") * 9 &&
            col("n_both") * 10 >= col("sb") * 9, "duplicate")
          .when(col("n_both") * 10 >= col("sa") * 9, "a_in_b")
          .when(col("n_both") * 10 >= col("sb") * 9, "b_in_a")
          .otherwise("overlaps").as("relation"))
    assert(out.filter(col("relation") === "duplicate").count() >= 21)
    assert(out.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(out).count() == 0)
    tf.unpersist(); out.unpersist()
  }

  test("t26 shuffle fallback (candBroadcastMax = 0) agrees row-for-row " +
    "with the broadcast path") {
    val fast = ext.TextOps2.t26ContainmentImpl(spark, sf, Long.MaxValue)
    val slow = ext.TextOps2.t26ContainmentImpl(spark, sf, 0L)
    assert(fast.count() > 0)
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
  }

  test("e11 projection is deterministic and distance-correlated on " +
    "duplicated vectors") {
    val r = ext.SimilarityOps.all.find(_.name == "e11_random_projection").get
      .run(spark, sf)
    val again = ext.SimilarityOps.all.find(_.name == "e11_random_projection")
      .get.run(spark, sf)
    // byte-stable across runs
    assert(r.collect().toSeq == again.collect().toSeq)
    // all 8 projected dims present and finite
    val cols = (0 until 8).map(j => s"r$j")
    cols.foreach { c =>
      assert(r.filter(col(c).isNull || isnan(col(c))).count() == 0)
    }
  }
}

class ParSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col

  test("fanOut repartitions an under-split scan and is an identity at " +
    "full parallelism") {
    val d = graft.tables.Tables.documents(spark, sf)
    assert(d.rdd.getNumPartitions <
      spark.sparkContext.defaultParallelism) // the trap exists at test scale
    val fanned = graft.ops.Par.fanOut(d, "doc_id")
    assert(fanned.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // already-parallel input: same plan comes back, no extra exchange
    val wide = d.repartition(spark.sparkContext.defaultParallelism + 3,
      col("doc_id"))
    assert(graft.ops.Par.fanOut(wide, "doc_id") eq wide)
  }
}

class PqSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions.col

  test("e12 codes are complete and in codebook range") {
    val r = ext.SimilarityOps.e12PqEncode(spark, sf).cache()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(r.count() == n) // every vector encoded
    val codeCols = (0 until 8).map(m => s"c$m")
    codeCols.foreach { c =>
      assert(r.filter(col(c).isNull ||
        col(c) < 0 || col(c) >= 16).count() == 0)
    }
    // codes actually discriminate: more than one distinct codeword used
    // in every subspace (a collapsed codebook would flag a Lloyd bug)
    codeCols.foreach { c =>
      assert(r.select(col(c)).distinct().count() > 1, s"$c collapsed")
    }
  }

  test("e14 ivf-pq prunes the candidate set and stays a valid rate") {
    val r = ext.SimilarityOps.e14IvfPqSearch(spark, sf).cache()
    val n = graft.tables.Tables.embeddings(spark, sf).count()
    assert(r.count() == 5)
    // probing 2 of 16 cells must prune hard: well under half the corpus
    assert(r.filter(col("n_cands") >= n / 2).count() == 0)
    assert(r.filter(col("n_cands") < 1).count() == 0)
    assert(r.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
  }

  test("e13 recall is a valid rate and beats the random baseline") {
    val r = ext.SimilarityOps.e13PqSearch(spark, sf).cache()
    assert(r.count() == 5)
    assert(r.filter(col("recall") < 0 || col("recall") > 1).count() == 0)
    // mean recall across queries must beat random top-10 selection
    // (10/N ≈ 2%) by an order of magnitude
    val mean = r.agg(org.apache.spark.sql.functions.avg("recall"))
      .head().getDouble(0)
    assert(mean > 0.1, s"mean PQ recall $mean suspiciously low")
  }
}

/** Property-style checks for the chunking geometry and sampling hash —
  * driven by the real corpus rather than generators, asserting the
  * algebraic invariants hold for every row. */
class ChunkPropertySpec extends AnyFunSuite {
  import TestSpark._

  test("every token lands in exactly 1 or 2 chunks (stride 30, width 40)") {
    // token position p is covered by chunk starts s in (p-40, p] stepping
    // 30: that's ceil((min(p, n-1) - max(0, p-39))/30+...) — instead of
    // re-deriving, count coverage directly from the chunk table.
    val chunks = ext.TextOps2.t19Chunking(spark, sf)
      .select(col("doc_id"), col("start_token"), col("n_chunk_tokens"))
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val tokens = docs.select(col("doc_id"),
      explode(sequence(lit(0), col("n") - 1)).as("p"))
    val cover = tokens.join(chunks, "doc_id")
      .filter(col("p") >= col("start_token") &&
        col("p") < col("start_token") + col("n_chunk_tokens"))
      .groupBy(col("doc_id"), col("p")).count()
    assert(cover.filter(col("count") < 1 || col("count") > 2).count() == 0)
    // and no position is uncovered
    assert(cover.count() ==
      docs.agg(sum(col("n"))).head().getLong(0))
  }

  test("t25 sampling hash is a pure function of doc_id (re-run identical)") {
    val a = ext.TextOps2.t25StratifiedSample(spark, sf)
      .select("doc_id", "hash_ppm").collect().toSeq
    val b = ext.TextOps2.t25StratifiedSample(spark, sf)
      .select("doc_id", "hash_ppm").collect().toSeq
    assert(a == b)
  }
}

/** t31 semantic invariants: the vocabulary spectrum must reconcile with
  * raw token counts. */
class VocabStatsSpec extends AnyFunSuite {
  import TestSpark._

  test("t31 vocabulary spectrum reconciles: tokens >= types >= hapax, " +
    "head share consistent") {
    val r = ext.TextOps2.t31VocabStats(spark, sf)
    assert(r.filter(col("n_types") > col("n_tokens")).count() == 0)
    assert(r.filter(col("n_hapax") > col("n_types")).count() == 0)
    assert(r.filter(col("top_n") > col("n_tokens")).count() == 0)
    // total token mass equals the corpus token count per language
    val raw = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_raw"))
    assert(r.join(raw, "lang")
      .filter(col("n_tokens") =!= col("n_raw")).count() == 0)
    // the head token's count is the max over the per-language vocabulary
    val vocabMax = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("lang")).agg(max(col("n")).as("nmax"))
    assert(r.join(vocabMax, "lang")
      .filter(col("top_n") =!= col("nmax")).count() == 0)
  }
}

/** t32 semantic invariants: novelty bounds and exact-duplicate behavior. */
class NoveltyScoreSpec extends AnyFunSuite {
  import TestSpark._

  test("t32 novelty: bounded in [0, 1e6]; exact duplicates have zero " +
    "novelty; singleton-shingle docs reconcile") {
    val r = ext.TextOps2.t32NoveltyScore(spark, sf)
    assert(r.filter(col("n_unique") > col("n_shingles")).count() == 0)
    assert(r.filter(col("novelty_ppm") < 0 ||
      col("novelty_ppm") > 1000000).count() == 0)
    // any doc with an exact-duplicate twin shares every shingle => 0 novelty
    val d = graft.tables.Tables.documents(spark, sf)
    val dupIds = d.groupBy(col("text"))
      .agg(count(lit(1)).as("n"), collect_list(col("doc_id")).as("ids"))
      .filter(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"))
    val nonzero = r.join(dupIds, "doc_id").filter(col("novelty_ppm") > 0)
    assert(nonzero.count() == 0)
  }
}

/** t33 semantic invariants: drift masses and vocabulary overlap must
  * reconcile with the whole-corpus totals. */
class CorpusDriftSpec extends AnyFunSuite {
  import TestSpark._

  test("t33 drift report reconciles: sides partition the corpus, shared " +
    "vocab bounded by either side") {
    val r = ext.TextOps2.t33CorpusDrift(spark, sf)
    val d = graft.tables.Tables.documents(spark, sf)
    val total = d.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val j = r.join(total, "lang")
    assert(j.filter(col("docs_v1") + col("docs_v2") =!= col("n_docs"))
      .count() == 0)
    assert(j.filter(col("tokens_v1") + col("tokens_v2") =!= col("n_tokens"))
      .count() == 0)
    assert(r.filter(col("vocab_shared") > least(col("vocab_v1"),
      col("vocab_v2"))).count() == 0)
    assert(r.filter(col("vocab_jaccard_ppm") < 0 ||
      col("vocab_jaccard_ppm") > 1000000).count() == 0)
  }
}

/** t30 semantic invariants: segment-instance conservation and
  * exactly-once election per distinct segment text. */
class SegmentDedupSpec extends AnyFunSuite {
  import TestSpark._

  test("t30 keeps each distinct segment exactly once and conserves " +
    "instance counts") {
    val r = ext.TextOps2.t30SegmentDedup(spark, sf)
    val segs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(10))).as("start"))
      .select(array_join(slice(col("t"), col("start") + 1, lit(10)), " ")
        .as("seg"))
    val agg = r.agg(sum(col("n_kept")), sum(col("n_segs"))).head()
    assert(agg.getLong(0) == segs.distinct().count())
    assert(agg.getLong(1) == segs.count())
    assert(r.filter(col("n_kept") > col("n_segs")).count() == 0)
    // a cleaned doc is never longer than its source
    val src = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("src_len"))
    assert(r.join(src, "doc_id")
      .filter(col("clean_len") > col("src_len")).count() == 0)
  }
}

/** Short-document robustness: docs with fewer tokens than the gram
  * width must be gram-free (Spark's sequence(0, negative) descends —
  * unguarded it fabricates grams from negative indexes; the oracle's
  * range() is simply empty). */
class ShortDocSpec extends AnyFunSuite {
  import TestSpark._

  test("gram-based ops drop sub-gram-width docs instead of fabricating") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shortdocs").toString
    Seq(
      (0L, "one", "en", "s", 3L),
      (1L, "two words", "en", "s", 9L),
      (2L, "a b c d e f g h i j k l", "en", "s", 23L),
      (3L, "a b c d e f g h i j k l", "es", "s", 23L),
      (10L, "x y z p q r s t u v w a", "fr", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    // t21 (3-grams): docs 0,1 absent; others present
    val t21 = ext.TextOps2.t21Repetition(spark, dir)
    assert(t21.select("doc_id").as[Long].collect().toSet == Set(2L, 3L, 10L))
    // t22 (bigrams): doc 0 absent
    val t22docs = ext.TextOps2.t22Tfidf(spark, dir)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(t22docs == Set(1L, 2L, 3L, 10L))
    // t28 (8-grams): runs without error; only >=8-token docs participate
    val t28 = ext.TextOps2.t28Decontamination(spark, dir)
    assert(t28.collect().forall(_.getLong(0) >= 0)) // executes cleanly
  }
}
