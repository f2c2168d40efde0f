package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps2

/** Invariants of the diversity-sampling operators: e25 greedy k-center
  * (farthest-first traversal) and e26 cluster-balanced sampling.
  * Exact-value parity is gated by the DuckDB oracle at sf0.01; here we
  * check the guarantees each algorithm is FOR: e25's seed rule, selection
  * distinctness and the monotone coverage certificate that makes it a
  * 2-approximation; e26's exact sqrt quota per cell and full-corpus cell
  * accounting. */
class CoresetSpec extends AnyFunSuite {
  import TestSpark._

  test("e25 k-center: seed is min vec_id; rounds distinct; coverage non-increasing") {
    val r = SimilarityOps2.e25KCenterCoreset(spark, sf).collect()
    assert(r.length == 8)
    assert(r.map(_.getLong(0)).toSeq == (1L to 8L))
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "centers must be distinct")
    // Seed is the smallest vec_id with coverage 0 by convention.
    val minId = graft.tables.Tables.embeddings(spark, sf)
      .agg(min(col("vec_id"))).head().getLong(0)
    assert(r.head.getLong(1) == minId && r.head.getDouble(2) == 0.0)
    // Greedy picks the farthest remaining point each round and min-distances
    // only shrink as centers accumulate, so the selected radii must be
    // non-increasing from round 2 on — the k-center 2-approx certificate.
    val radii = r.drop(1).map(_.getDouble(2))
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"coverage radii must be non-increasing: ${radii.mkString(",")}")
    assert(radii.head > 0.0, "a non-degenerate corpus has a positive radius")
  }

  test("e25 k-center: round-2 radius equals the true max distance from the seed") {
    val r = SimilarityOps2.e25KCenterCoreset(spark, sf).collect()
    val seedId = r.head.getLong(1)
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val seedVec = e.filter(col("vec_id") === seedId)
      .head().getSeq[Float](1).toArray
    // Same sequential-left-fold double accumulation as VecOps.dot.
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    // Recompute ‖x−seed‖² rounded 4 exactly as the operator does.
    val maxD = e.collect().filter(_.getLong(0) != seedId).map { row =>
      val v = row.getSeq[Float](1).toArray
      BigDecimal(d2(v, v) + d2(seedVec, seedVec) - 2 * d2(v, seedVec))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.max
    assert(math.abs(r(1).getDouble(2) - maxD) < 1e-9,
      s"round-2 radius ${r(1).getDouble(2)} != direct max $maxD")
  }

  test("e25 k-center: a corpus smaller than K exhausts cleanly at N centers") {
    import spark.implicits._
    val tiny = Seq(
      (10L, Array(0f, 0f)), (11L, Array(3f, 4f)), (12L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val r = SimilarityOps2.e25Of(spark, tiny).collect()
    assert(r.length == 3)
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // seed 10, then (3,4) at 25, then (0,1) at 1 — order + radii exact
    assert(r.map(_.getLong(1)).toSeq == Seq(10L, 11L, 12L))
    assert(r.map(_.getDouble(2)).toSeq == Seq(0.0, 25.0, 1.0))
    intercept[IllegalArgumentException] {
      SimilarityOps2.e25Of(spark, tiny.filter(col("vec_id") < 0))
    }
  }

  test("e26 cluster sample: exact ceil(sqrt) quota per cell; cells cover the corpus") {
    val r = SimilarityOps2.e26ClusterSample(spark, sf).collect()
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "a vector sampled once at most")
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val n = rows.head.getLong(2)
      assert(rows.forall(_.getLong(2) == n), "cell_n consistent within a cell")
      val quota = math.ceil(math.sqrt(n.toDouble)).toLong
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.toSeq == (1L to quota),
        s"ranks must be exactly 1..$quota, got ${ranks.mkString(",")}")
    }
    // Every vector sits in exactly one cell, so distinct cell sizes must
    // sum to the corpus — the sampler saw everything, dense cells get
    // sublinear representation.
    val total = graft.tables.Tables.embeddings(spark, sf).count()
    val cellSum = r.groupBy(_.getLong(0)).values.map(_.head.getLong(2)).sum
    assert(cellSum == total, s"cells cover $cellSum of $total vectors")
    assert(r.length < total, "sampling must actually prune")
  }

  test("e30 cluster outliers: ≤3 contiguous ranks per cell, distances descend, signal varies") {
    val r = SimilarityOps2.e30ClusterOutliers(spark, sf).collect()
    val ids = r.map(_.getLong(1))
    assert(ids.distinct.length == ids.length,
      "a vector is an outlier of exactly one cell (its own)")
    r.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq ==
        (1L to byRank.length).toSeq, "ranks contiguous from 1")
      assert(byRank.length <= 3)
      val ds = byRank.map(_.getDouble(2))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b },
        "distance must not increase with rank")
      // L2² can only dip below zero by the documented rounding slack
      assert(ds.forall(_ >= -0.0001))
    }
    // every trained cell that holds vectors must surface outliers, and
    // the distance signal must discriminate
    val cells = SimilarityOps2.e26ClusterSample(spark, sf).collect()
      .map(_.getLong(0)).distinct.sorted.toSeq
    assert(r.map(_.getLong(0)).distinct.sorted.toSeq == cells,
      "e30 must report exactly the populated cells e26 sees")
    assert(r.map(_.getDouble(2)).distinct.length > 1)
  }
}
