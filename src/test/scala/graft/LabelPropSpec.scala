package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{SimilarityOps, SimilarityOps2}

/** e29 kNN label propagation: the vote must match a driver-side recompute
  * over the (e17-gate-verified) graph, and the smallest-label tie-break
  * must actually be exercised by the corpus, not just dead code. */
class LabelPropSpec extends AnyFunSuite {
  import TestSpark._

  test("e29 vote matches a direct recompute over the e17 graph; ties break to the smallest label; flips exist") {
    val edges = SimilarityOps.e17KnnGraphWide(spark, sf)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    val expect = edges.groupBy(_._1).map { case (a, es) =>
      val counts = es.map(e => labels(e._2))
        .groupBy(identity).map { case (l, v) => (l, v.size.toLong) }
      val (lab, votes) = counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      a -> (lab, votes, counts)
    }
    val r = SimilarityOps2.e29LabelProp(spark, sf).collect()
    assert(r.length == expect.size, "one vote per node with neighbors")
    r.foreach { x =>
      val (lab, votes, _) = expect(x.getLong(0))
      assert(x.getLong(1) == labels(x.getLong(0)))
      assert(x.getLong(2) == lab, s"node ${x.getLong(0)} vote")
      assert(x.getLong(3) == votes)
      assert(x.getBoolean(4) == (labels(x.getLong(0)) != lab))
    }
    // the corpus must actually exercise the tie-break (top count shared
    // by 2+ labels) — otherwise the deterministic-tie contract is untested
    val ties = expect.values.count { case (_, votes, counts) =>
      counts.values.count(_ == votes) >= 2
    }
    assert(ties > 0, "no vote ties in corpus: tie-break untested")
    // and propagation must disagree somewhere, or the signal is inert
    assert(r.exists(_.getBoolean(4)), "no flips: disagreement signal inert")
    assert(r.exists(!_.getBoolean(4)), "all flips: vote inverted?")
  }
}
