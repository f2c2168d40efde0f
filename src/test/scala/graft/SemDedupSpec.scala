package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the e20 SemDeDup keeper election (exact-value parity vs
  * DuckDB is gated by the oracle at sf0.01; here the semantic contract):
  * every multi-member near-dup cluster elects exactly one keeper, the
  * keeper maximizes cosine-to-centroid (ties → smallest vec_id), and the
  * elected set covers exactly e15's multi-member clusters.
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val out =
    ext.SimilarityOps2.e20SemdedupKeep(spark, sf).collect()

  test("exactly one keeper per cluster, n_members consistent") {
    val byCluster = out.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster.nonEmpty)
    byCluster.foreach { case (c, rows) =>
      assert(rows.count(_.getAs[Boolean]("keep")) == 1,
        s"cluster $c must elect exactly one keeper")
      // n_members is the actual member count and >= 2 by construction
      assert(rows.forall(_.getAs[Long]("n_members") == rows.length))
      assert(rows.length >= 2, s"cluster $c has a singleton in e20 output")
    }
  }

  test("the keeper maximizes cosine-to-centroid with vec_id tie-break") {
    out.groupBy(_.getAs[Long]("cluster")).foreach { case (_, rows) =>
      val best = rows.minBy(r =>
        (-r.getAs[Double]("cos_c"), r.getAs[Long]("vec_id")))
      assert(best.getAs[Boolean]("keep"))
    }
  }

  test("e20 covers exactly e15's multi-member clusters") {
    val clusters = ext.SimilarityOps
      .e15EmbeddingClusters(spark, sf)
      .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .collect().map(_.getAs[Long]("cluster")).toSet
    val e20Clusters = out.map(_.getAs[Long]("cluster")).toSet
    assert(e20Clusters == clusters)
  }
}
