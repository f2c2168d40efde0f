package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SimilarityOps2
import graft.functions.VecOps

/** The MIPS→cosine reduction that lets the cosine-oriented ANN stack
  * (sign-LSH buckets, IVF cells) serve inner-product retrieval: augment
  * candidates to constant norm M, and augmented cosine becomes
  * dot/(‖q‖·M) — strictly monotone in the inner product. The spec proves
  * the per-query orderings coincide on the real corpus, which is exactly
  * the property e18's scale path depends on. */
class Mips2CosineSpec extends AnyFunSuite {
  import TestSpark._

  test("augmented-cosine ranking equals inner-product ranking per query") {
    val e = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"),
        VecOps.graft_vec_norm(col("embedding")).as("nrm"))
    val m = e.agg(max(col("nrm"))).collect()(0).getDouble(0)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        col("nrm").as("qnorm"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        VecOps.graft_vec_dot(col("qe"), col("embedding")).as("ip"),
        // cosine in the augmented space: candidate norm is exactly M
        // after the sqrt(M²−‖x‖²) pad, query pads with 0
        (VecOps.graft_vec_dot(col("qe"), col("embedding")) /
          (col("qnorm") * lit(m))).as("aug_cos"))
      .collect()
    // The division by the constant qnorm·M is only WEAKLY monotone in
    // floating point: two distinct dot products can land on the same
    // aug_cos, and inside such a tie the inner-product order is not
    // recoverable — so compare orderings modulo aug_cos ties. Walking
    // the ip-descending order and grouping consecutive equal-aug_cos
    // runs must reproduce exactly the aug_cos-descending tie groups;
    // any genuine order inversion makes a cos value recur in separate
    // runs and the sequences diverge.
    pairs.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ipOrder = rows.sortBy(r => (-r.getDouble(2), r.getLong(1)))
      val ipRuns = scala.collection.mutable.ArrayBuffer[(Double, Set[Long])]()
      ipOrder.foreach { r =>
        val c = r.getDouble(3)
        if (ipRuns.nonEmpty && ipRuns.last._1 == c)
          ipRuns(ipRuns.size - 1) = (c, ipRuns.last._2 + r.getLong(1))
        else ipRuns += ((c, Set(r.getLong(1))))
      }
      val cosRuns = rows.groupBy(_.getDouble(3)).toSeq.sortBy(-_._1)
        .map { case (c, rs) => (c, rs.map(_.getLong(1)).toSet) }
      assert(ipRuns.toSeq == cosRuns)
    }
  }

  test("e18 returns 10 ranked neighbors per query, ranks contiguous") {
    val r = SimilarityOps2.e18MipsTopK(spark, sf).collect()
    val byQ = r.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 10)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 10L))
    }
  }
}
