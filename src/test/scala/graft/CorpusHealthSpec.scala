package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps4

/** t56 self-repetition and t57 vocabulary concentration: both must match
  * driver-side recomputes from the raw text, and the corpus must actually
  * exercise the non-trivial branches (repeats exist; half-mass boundary
  * falls strictly inside the vocabulary). */
class CorpusHealthSpec extends AnyFunSuite {
  import TestSpark._

  private def docs() = graft.tables.Tables.documents(spark, sf)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("t56 repeated-gram profile matches a sliding-window recompute") {
    val expect = docs().flatMap { case (id, _, text) =>
      val toks = text.split(" ", -1)
      Seq(2, 4, 8).filter(_ <= toks.length).map { k =>
        val counts = toks.sliding(k).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (_, v) => v.size.toLong }
        val nPos = counts.sum
        val nRep = counts.filter(_ >= 2).sum
        (id, k.toLong) -> (nPos, nRep, counts.max,
          1000000L * nRep / nPos)
      }
    }.toMap
    val r = TextOps4.t56SelfRepetition(spark, sf).collect()
    assert(r.length == expect.size)
    r.foreach { x =>
      val (nPos, nRep, mx, ppm) = expect((x.getLong(0), x.getLong(1)))
      assert(x.getLong(2) == nPos, s"doc ${x.getLong(0)} k ${x.getLong(1)}")
      assert(x.getLong(3) == nRep)
      assert(x.getLong(4) == mx)
      assert(x.getLong(5) == ppm)
    }
    // the signal must discriminate: some docs repeat themselves, some not
    assert(r.exists(x => x.getLong(1) == 2L && x.getLong(3) > 0))
    assert(r.exists(x => x.getLong(3) == 0))
  }

  test("t57 concentration report matches a direct per-source recompute") {
    val bySource = docs().groupBy(_._2)
    val expect = bySource.map { case (src, ds) =>
      val freq = ds.flatMap(_._3.split(" ", -1))
        .groupBy(identity).map { case (t, v) => (t, v.size.toLong) }
      val ranked = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      val nTokens = ranked.map(_._2).sum
      val cum = ranked.map(_._2).scanLeft(0L)(_ + _).tail
      val p50 = cum.indexWhere(_ * 2 >= nTokens) + 1L
      src -> (nTokens, ranked.length.toLong,
        1000000L * ranked.count(_._2 == 1L) / ranked.length,
        1000000L * ranked.take(10).map(_._2).sum / nTokens, p50)
    }
    val r = TextOps4.t57VocabConcentration(spark, sf).collect()
    assert(r.length == expect.size)
    r.foreach { x =>
      val (nTok, nTyp, hapax, top10, p50) = expect(x.getString(0))
      assert(x.getLong(1) == nTok, s"${x.getString(0)} tokens")
      assert(x.getLong(2) == nTyp, s"${x.getString(0)} types")
      assert(x.getLong(3) == hapax, s"${x.getString(0)} hapax")
      assert(x.getLong(4) == top10, s"${x.getString(0)} top10")
      assert(x.getLong(5) == p50, s"${x.getString(0)} p50")
    }
    // half-mass point must be non-trivial: past rank 1, before the tail
    assert(r.forall(x => x.getLong(5) >= 1 && x.getLong(5) <= x.getLong(2)))
    assert(r.exists(x => x.getLong(5) > 1))
  }

  test("t58 leakage matrix equals the t48 span report rolled up by source pair") {
    val srcOf = docs().map(d => d._1 -> d._2).toMap
    val spans = graft.ext.TextOps3.t48SubstringDedup(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4)))
    val expect = spans.map { case (a, b, w) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) (sa, sb) else (sb, sa), (a, b), w)
    }.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._2).distinct.length.toLong,
        v.map(_._3).sum)
    }
    val r = graft.ext.TextOps3.t58CrossSourceLeakage(spark, sf).collect()
    assert(r.length == expect.size)
    r.foreach { x =>
      val key = (x.getString(0), x.getString(1))
      val (nSpans, nPairs, words) = expect(key)
      assert(x.getLong(2) == nSpans, s"$key spans")
      assert(x.getLong(3) == nPairs, s"$key pairs")
      assert(x.getLong(4) == words, s"$key words")
      assert(x.getBoolean(5) == (key._1 != key._2), s"$key flag")
    }
    // the leakage signal must actually fire across sources here
    assert(r.exists(_.getBoolean(5)), "no cross-source spans: audit inert")
  }
}
