package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps2

/** e31 per-dimension stats and e32 centroid separation: the integer
  * moments must match a driver recompute on the integerized values, and
  * the separation audit must be symmetric and correctly ranked. */
class EmbedHealthSpec extends AnyFunSuite {
  import TestSpark._

  test("e31 integer moments match a direct recompute on integerized values") {
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val r = SimilarityOps2.e31DimStats(spark, sf).collect()
    assert(r.length == dims)
    r.foreach { x =>
      val d = x.getLong(0).toInt - 1
      val vi = vecs.map(v => math.floor(v(d).toDouble * 1000000 + 0.5).toLong)
      val n = vi.length.toLong
      val sv = vi.sum
      val svv = vi.map(v => v * v).sum
      assert(x.getLong(1) == n)
      assert(x.getLong(2) == sv / n, s"dim ${d + 1} mean")
      assert(x.getLong(3) == (svv * n - sv * sv) / (n * n), s"dim ${d + 1} var")
      assert(x.getLong(4) == vi.min)
      assert(x.getLong(5) == vi.max)
      assert(x.getLong(6) == 1000000L * vi.count(_ == 0L) / n)
    }
    // variance of a non-constant column is strictly positive
    assert(r.forall(_.getLong(3) >= 0))
    assert(r.exists(_.getLong(3) > 0))
  }

  test("e32 separation audit: distances symmetric, ranks respect (d2, cid) order") {
    val r = SimilarityOps2.e32CentroidSeparation(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    val cids = r.map(_._1).distinct
    assert(cids.length > 1, "more than one centroid")
    assert(r.forall(x => x._4 >= 1 && x._4 <= 3))
    cids.foreach { c =>
      val mine = r.filter(_._1 == c).sortBy(_._4)
      assert(mine.map(_._4).toSeq == (1L to mine.length.toLong).toSeq,
        s"cid $c ranks")
      // ranked ascending by (d2, cid_b)
      mine.sliding(2).filter(_.length == 2).foreach { case Array(a, b) =>
        assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2), s"cid $c order")
      }
      assert(mine.forall(_._3 >= 0), "L2^2 distances are non-negative")
    }
    // symmetry of the underlying metric: if (a,b) and (b,a) both appear
    // in a top-3 list they carry the same rounded distance
    val d = r.map(x => (x._1, x._2) -> x._3).toMap
    d.foreach { case ((a, b), v) =>
      d.get((b, a)).foreach(v2 => assert(v == v2, s"asym $a-$b"))
    }
  }

  test("e33 distortion audit: covers every assignment exactly once, internally consistent, discriminates") {
    val r = SimilarityOps2.e33PqDistortion(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))
    val nVecs = graft.tables.Tables.embeddings(spark, sf).count()
    // every (vector, subspace) assignment lands in exactly one codeword row
    val m = r.map(_._1).distinct.length
    assert(r.map(_._3).sum == nVecs * m, "assignments conserved")
    r.foreach { case (sub, cid, n, tot, mean, mx) =>
      assert(n > 0 && tot >= 0, s"($sub,$cid)")
      assert(mean == tot / n, s"($sub,$cid) mean")
      assert(mx * n >= tot, s"($sub,$cid) max bounds total")
    }
    // distortion must discriminate across codewords, or the audit is inert
    assert(r.map(_._5).distinct.length > 1)
  }

  test("e34 tuning curve: recall and candidate volume are monotone in nprobe; nprobe=2 row equals the shipped e06 recall") {
    val r = SimilarityOps2.e34NprobeCurve(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 4L))
    r.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 > lo._3, "candidate volume grows with nprobe")
      assert(hi._4 >= lo._4, "hits never shrink as cells are added")
      assert(hi._5 >= lo._5, "recall is monotone in nprobe")
    }
    // wider probe must actually buy something on this corpus
    assert(r.last._5 > r.head._5, "flat curve: tuning signal inert")
    // recall at every width is far above the random baseline
    assert(r.forall(_._5 > 100000), "recall below 10%: probe broken")
  }
}
