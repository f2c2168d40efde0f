package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps4

/** Invariants for the fourth text-operator wave. Exact-value parity is
  * gated by the DuckDB oracle at sf0.01; here we check the model-apply
  * semantics directly against an independent driver-side reimplementation. */
class TextOps4Spec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The t50 scorer, reimplemented from the definition (not the code). */
  private def score(text: String): Long =
    text.split(" ", -1).map { t =>
      val b = java.lang.Long.parseLong(md5hex("feat:" + t).take(8), 16) % 64
      b * 2654435761L % 1001L - 500L
    }.sum

  test("t50 classifier: every doc covered; kept == score>0; scores match a direct reimplementation") {
    val r = TextOps4.t50QualityClassifier(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1))).toMap
    assert(r.length == docs.size, "one verdict per document")
    r.foreach { x =>
      val (id, n, raw, kept) =
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3))
      val text = docs(id)
      assert(n == text.split(" ", -1).length)
      assert(raw == score(text), s"doc $id score mismatch")
      assert(kept == (raw > 0))
    }
    // The toy weights are mean-centered enough that a real corpus must
    // split: an all-kept or all-dropped verdict means the scorer is inert.
    val nk = r.count(_.getBoolean(3))
    assert(nk > 0 && nk < r.length, s"degenerate split: $nk of ${r.length}")
  }

  test("t51 gopher rules: flags match a direct reimplementation; gate splits the corpus") {
    val stop = Seq("the", "a", "of", "to", "and")
    val r = TextOps4.t51GopherRules(spark, sf).collect()
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(x => (x.getLong(0), (x.getString(1), x.getLong(2)))).toMap
    assert(r.length == docs.size)
    r.foreach { x =>
      val (text, nChars) = docs(x.getLong(0))
      val words = text.split(" ", -1)
      val nWords = words.length.toLong
      val wordChars = nChars - nWords + 1
      val nStop = stop.count(words.contains)
      val maxW = words.map(_.length).max
      assert(x.getLong(1) == nWords && x.getLong(2) == wordChars)
      assert(x.getLong(3) == nStop && x.getLong(4) == maxW)
      assert(x.getBoolean(5) == (nWords >= 30 && nWords <= 80))
      assert(x.getBoolean(6) ==
        (4 * nWords <= wordChars && wordChars <= 10 * nWords))
      assert(x.getBoolean(7) == (nStop >= 2))
      assert(x.getBoolean(8) == (maxW <= 12))
      assert(x.getBoolean(9) ==
        (x.getBoolean(5) && x.getBoolean(6) && x.getBoolean(7) &&
          x.getBoolean(8)))
    }
    val nk = r.count(_.getBoolean(9))
    assert(nk > 0 && nk < r.length, s"degenerate gate: $nk of ${r.length}")
  }

  test("t52 perplexity buckets: terciles are balanced per language and ordered by score") {
    val r = TextOps4.t52PerplexityBuckets(spark, sf).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3),
        x.getString(4)))
    r.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._4).map { case (b, g) => b -> g.length }
      assert(sizes.keySet.subsetOf(Set(1L, 2L, 3L)))
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang terciles unbalanced: $sizes")
      // bucket boundaries respect the (score desc, doc_id) order
      val sorted = rows.sortBy(t => (-t._3, t._1)).map(_._4)
      assert(sorted.sameElements(sorted.sorted), s"$lang buckets out of order")
      rows.foreach { case (_, _, _, b, nm) =>
        val expect = b match {
          case 1L => "head"; case 2L => "middle"; case _ => "tail"
        }
        assert(nm == expect)
      }
    }
    // every doc scored with the t50 model
    val t50 = TextOps4.t50QualityClassifier(spark, sf).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    r.foreach { case (id, _, s0, _, _) => assert(s0 == t50(id)) }
  }

  test("t53 KN score: matches a direct reimplementation; smoothing shifts scores vs t37 MLE") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ", -1))).toMap
    // train the KN tables from the definition, not the code
    val bigrams = docs.values.toSeq.flatMap(w => w.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val c2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1p = c2.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val nc = c2.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val ntot = c2.size.toLong
    def pppm(w1: String, w2: String): Long =
      250000L * (4L * c2((w1, w2)) - 3L) / c1(w1) +
        750000L * n1p(w1) * nc(w2) / (c1(w1) * ntot)
    val r = TextOps4.t53KnScore(spark, sf).collect()
    assert(r.length == docs.count(_._2.length >= 2))
    r.foreach { x =>
      val w = docs(x.getLong(0))
      val ps = w.sliding(2).filter(_.length == 2).map(p => pppm(p(0), p(1))).toSeq
      assert(x.getLong(1) == ps.size)
      assert(x.getLong(2) == ps.sum / ps.size, s"doc ${x.getLong(0)} KN mean")
    }
    // smoothing must actually move mass: KN != MLE on a real corpus
    val mle = graft.ext.TextOps3.t37LmScore(spark, sf).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r.count(x => mle(x.getLong(0)) != x.getLong(2)) > 0,
      "KN collapsed to the unsmoothed MLE")
  }

  /** BPE train + apply, reimplemented from the contract (Sennrich et al.
    * 2016, with the operator's documented delimited-string merge
    * semantics — left-to-right non-overlapping literal replacement, the
    * behavior `replace` has in BOTH engines): 6 rounds of argmax pair
    * merge over corpus-weighted distinct-word segmentations,
    * (total DESC, a, b) tiebreak. */
  private def bpeReimpl(texts: Seq[String]): Map[String, Long] = {
    val wf = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).map { case (w, v) => w -> v.size.toLong }
    var seg: Map[String, String] =
      wf.keys.map(w => w -> (" " + w.map(c => s"$c ").mkString)).toMap
    (1 to 6).foreach { _ =>
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      seg.foreach { case (w, s) =>
        s.trim.split(" ").sliding(2).filter(_.length == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + wf(w)
        }
      }
      val ((a, b), _) = pairs.toSeq
        .sortBy { case ((x, y), tot) => (-tot, x, y) }.head
      seg = seg.map { case (w, s) =>
        w -> s.replace(s" $a $b ", s" $a$b ")
      }
    }
    seg.map { case (w, s) => w -> s.trim.split(" ").length.toLong }
  }

  test("t54 BPE apply: per-lang token mass matches a from-scratch BPE train+apply; merges compress") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(x => (x.getString(0), x.getString(1)))
    val tokensPerWord = bpeReimpl(docs.map(_._2))
    val expect = docs.groupBy(_._1).map { case (lang, rows) =>
      val words = rows.flatMap(_._2.split(" ", -1))
      lang -> (words.distinct.size.toLong,
        words.size.toLong, words.map(tokensPerWord).sum)
    }
    val r = TextOps4.t54BpeApply(spark, sf).collect()
    assert(r.length == expect.size)
    r.foreach { x =>
      val (nd, nw, nt) = expect(x.getString(0))
      assert(x.getLong(1) == nd, s"${x.getString(0)} distinct words")
      assert(x.getLong(2) == nw, s"${x.getString(0)} word instances")
      assert(x.getLong(3) == nt, s"${x.getString(0)} token mass")
      assert(x.getLong(4) == 1000000L * nt / nw)
      // merges must compress: fewer tokens than characters, more than words
      assert(x.getLong(3) > x.getLong(2), "tokens >= words only at full merge")
    }
  }

  test("t55 DSIR select: weights/scores match a direct reimplementation; selection splits and leans target") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    def bucket(t: String): Int =
      (java.lang.Long.parseLong(md5hex("dsir:" + t).take(8), 16) % 128).toInt
    val toks = docs.flatMap { case (_, lang, text) =>
      text.split(" ", -1).map(t => (bucket(t), lang == "en")) }
    val w = toks.groupBy(_._1).map { case (b, v) =>
      b -> (1000000L * (v.count(_._2) + 1) / (v.size + 1)) }
    val share = 1000000L * toks.count(_._2) / toks.size
    val r = TextOps4.t55DsirSelect(spark, sf).collect()
    assert(r.length == docs.length)
    val byId = docs.map(d => d._1 -> d).toMap
    r.foreach { x =>
      val (_, lang, text) = byId(x.getLong(0))
      val words = text.split(" ", -1)
      val score = words.map(t => w(bucket(t))).sum / words.length
      assert(x.getString(1) == lang)
      assert(x.getLong(2) == words.length.toLong)
      assert(x.getLong(3) == score, s"doc ${x.getLong(0)} score")
      assert(x.getBoolean(4) == (score > share))
    }
    // the selector must split the corpus, and the kept slice must be
    // more English-leaning than the dropped one (it IS the target)
    val kept = r.filter(_.getBoolean(4))
    assert(kept.nonEmpty && kept.length < r.length)
    val keptEn = kept.count(_.getString(1) == "en").toDouble / kept.length
    val dropped = r.filterNot(_.getBoolean(4))
    val dropEn = dropped.count(_.getString(1) == "en").toDouble / dropped.length
    assert(keptEn > dropEn, f"kept en-share $keptEn%.2f <= dropped $dropEn%.2f")
  }

  test("Md5BucketSum kernel equals the conv(md5)-column chain, edge tokens included") {
    import spark.implicits._
    // the round-14 fold kernel must be bit-identical to the spelling it
    // replaced — including empty tokens from doubled/trailing separators
    val texts = Seq("hello world", "", " ", "a  b ", "samesame samesame",
      "une phrase avec des accents éèç", "x")
    val dims = Seq(("feat:", 64), ("dsir:", 128))
    dims.foreach { case (prefix, dim) =>
      val weights = Array.tabulate(dim)(b => (b.toLong * 31L) % 997L - 498L)
      val wArr = array(weights.toSeq.map(lit(_)): _*)
      val toks = split(col("t"), " ")
      val chain = texts.toDF("t").select(
        aggregate(toks, lit(0L), (acc, tok) => acc + element_at(wArr,
          ((conv(substring(graft.functions.Md5Hex.graft_md5(
            concat(lit(prefix), tok)), 1, 8), 16, 10).cast("long") % dim)
            + 1).cast("int"))).as("s"))
        .collect().map(_.getLong(0)).toSeq
      val kernel = texts.toDF("t").select(
        graft.functions.Md5BucketSum.graft_md5_bucket_sum(
          col("t"), prefix, dim, weights).as("s"))
        .collect().map(_.getLong(0)).toSeq
      assert(kernel == chain, s"$prefix$dim")
    }
  }
}
