package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{EventOps, SimilarityOps, SimilarityOps2, TextOps3}

/** Invariants for the round-7 third wave: matryoshka two-stage search
  * (e23), BPE merge-pair statistics (t46), and windowed semantic event
  * dedup (s12). Exact-value parity is gated by the DuckDB oracle at
  * sf0.01; here we check the guarantees each operator is FOR. */
class WaveDedupSearchSpec extends AnyFunSuite {
  import TestSpark._

  test("e23 matryoshka: exact re-rank is ordered and recalls the exact top-5") {
    val r = SimilarityOps2.e23MatryoshkaTopK(spark, sf).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.nonEmpty && byQ.values.forall(_.length == 5))
    // Within each query the exact stage must emit non-increasing cosine.
    byQ.values.foreach { rows =>
      val cos = rows.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // Recall@5 vs the exact brute force (e02's top-5). The synthetic
    // embeddings are isotropic random — the ADVERSARIAL case for
    // truncation, since no training ordered information into the prefix
    // the way matryoshka representation learning does — so the 16-dim
    // prefix is an unbiased but noisy cosine estimate and recall sits
    // near the untrained floor (observed 0.36 at sf0.001). The gate
    // asserts above-chance behavior with margin; trained-MRL embeddings
    // are where production recall comes from. (Chance for a 20-shortlist
    // over this corpus is well under 0.1.)
    val exact = SimilarityOps.e02CosineTopK(spark, sf)
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("cid")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = r.map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.2, s"matryoshka recall@5 $recall < 0.2")
  }

  test("e24 RRF: docs on both retriever lists dominate single-list docs") {
    // With K=60 and top-10 lists, the worst both-lists score
    // (2·⌊1e6/70⌋ = 28570) beats the best single-list score
    // (⌊1e6/61⌋ = 16393), so fused ranking must place every both-lists
    // doc ahead of every single-list doc — the property that makes RRF
    // a calibration-free combiner.
    val r = SimilarityOps2.e24RrfFusion(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val ordered = rows.sortBy(_.getLong(5))
      val both = ordered.map(x => !x.isNullAt(3) && !x.isNullAt(4))
      // once we see a single-list doc, no both-lists doc may follow
      assert(!both.dropWhile(identity).contains(true),
        "single-list doc ranked above a both-lists doc")
    }
    r.foreach { x =>
      val expected =
        (if (x.isNullAt(3)) 0L else 1000000L / (60 + x.getLong(3))) +
          (if (x.isNullAt(4)) 0L else 1000000L / (60 + x.getLong(4)))
      assert(x.getLong(2) == expected)
    }
  }

  test("t46 BPE pairs: counts match a direct recount on the instance stream") {
    val r = TextOps3.t46BpePairStats(spark, sf).collect()
    assert(r.length == 20)
    // total is corpus-weighted (every position of every instance): recount
    // the top pair directly from the exploded instance stream.
    val top = r.minBy(_.getLong(4))
    val (a, b) = (top.getString(0), top.getString(1))
    val direct = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .filter(expr("substr(word, i, 1)") === a &&
        expr("substr(word, i + 1, 1)") === b)
      .count()
    assert(top.getLong(2) == direct,
      s"top pair ($a,$b) total ${top.getLong(2)} != direct recount $direct")
    // Ranking is by total desc (ties broken a, b) — rnk order must agree.
    val sorted = r.sortBy(_.getLong(4))
    val totals = sorted.map(_.getLong(2))
    assert(totals.zip(totals.tail).forall { case (x, y) => x >= y })
  }

  test("s13 rate anomaly: trailing frame bounded at 24; spike test is the cross-multiplied mean") {
    val r = EventOps.s13RateAnomaly(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (n, ts, tn) = (x.getLong(2), x.getLong(3), x.getLong(4))
      assert(tn >= 1 && tn <= 24)
      assert(ts >= tn, "counts are >= 1 so the trailing sum covers its rows")
      assert(x.getBoolean(5) == (n * tn > ts * 2))
    }
  }

  test("s12 event dedup: kept = distinct (user,type,bucket) keys; totals add up") {
    val r = EventOps.s12EventDedup(spark, sf).collect()
    val events = graft.tables.Tables.events(spark, sf)
    val nAll = events.count()
    assert(r.map(_.getLong(1)).sum == nAll, "n_total must cover every event")
    r.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1))
      assert(x.getLong(4) == x.getLong(1) - x.getLong(2))
    }
    val sec = expr("ts div 1000000000")
    val distinctKeys = events
      .select(col("user_id"), col("event_type"),
        (sec - sec % 300).as("bucket"))
      .distinct().count()
    assert(r.map(_.getLong(2)).sum == distinctKeys,
      "keepers must be exactly one per (user, type, bucket)")
  }

  test("e27 MRR: judgment agrees with the two retrievers' own outputs") {
    val r = SimilarityOps2.e27RetrievalMrr(spark, sf).collect()
    val truth = SimilarityOps.e02CosineTopK(spark, sf)
      .filter(col("rnk") === 1).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val ham = SimilarityOps2.e22BinaryHammingTopK(spark, sf).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(4))).toMap
    assert(r.length == truth.size)
    r.foreach { x =>
      val (qid, tc, fr, rr) =
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3))
      assert(tc == truth(qid))
      assert(fr == ham.getOrElse((qid, tc), 0L))
      assert(rr == (if (fr > 0) 1000000L / fr else 0L))
    }
  }

  test("e28 nDCG: recomputed from the two retrievers' own outputs; bounded and discriminating") {
    val w = Seq(1000000L, 630929L, 500000L, 430676L)
    val ideal = w.zip(Seq(4L, 3L, 2L, 1L)).map { case (a, b) => a * b }.sum
    val rel = SimilarityOps.e02CosineTopK(spark, sf)
      .filter(col("rnk") <= 4).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), 5L - x.getLong(3))).toMap
    val got = SimilarityOps2.e22BinaryHammingTopK(spark, sf)
      .filter(col("rnk") <= 4).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(4)))
    val dcg = got.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.map { case (_, cid, rnk) =>
        rel.getOrElse((qid, cid), 0L) * w(rnk.toInt - 1)
      }.sum
    }
    val r = SimilarityOps2.e28RetrievalNdcg(spark, sf).collect()
    assert(r.length == dcg.size)
    r.foreach { x =>
      val (qid, d, n) = (x.getLong(0), x.getLong(1), x.getLong(2))
      assert(d == dcg(qid), s"query $qid DCG")
      assert(n == d * 1000000L / ideal)
      assert(n >= 0L && n <= 1000000L)
      // a perfect score means the retrieved top-4 IS the exact top-4
      if (n == 1000000L) {
        val top = got.filter(_._1 == qid).map(t => t._2 -> t._3).toMap
        assert(top.forall { case (cid, rnk) =>
          rel.get((qid, cid)).contains(5L - rnk)
        })
      }
    }
    assert(r.map(_.getLong(2)).distinct.length > 1,
      "nDCG must discriminate between queries")
  }
}
