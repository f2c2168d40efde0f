package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables._
import graft.ops.Out._

/** Second wave of embedding-similarity operators (e18): maximum
  * inner-product search. Split from [[SimilarityOps]] purely for file
  * size; shares its codegen'd vector kernels.
  */
object SimilarityOps2 {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.VecOps.graft_vec_dot(a, b)

  /** e18: exact maximum-inner-product top-k — the retrieval measure
    * learned-embedding rankers actually optimize (unnormalized dot, not
    * cosine: a vector's magnitude IS part of its relevance signal).
    * Brute force with the queries broadcast, one codegen'd kernel per
    * candidate — same plan skeleton as e02.
    *
    * The scale path is the classic MIPS→cosine reduction (Bachrach et
    * al. 2014): augment each candidate with sqrt(M² − ‖x‖²) (M = max
    * norm) so every augmented candidate has norm exactly M, and append 0
    * to queries; augmented cosine is then dot/(‖q‖·M) — a strictly
    * monotone function of the inner product — so the existing sign-LSH /
    * IVF cosine infrastructure (e03/e04/e06) indexes MIPS unchanged.
    * Mips2CosineSpec proves the ordering equivalence on this corpus;
    * this gate query stays brute-force so the oracle is exact. */
  def e18MipsTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embeddings(s, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("dot_r").desc, col("cid"))
    e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(dot(col("qe"), col("embedding")), 4).as("dot_r"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 10)
      .withColumn("rnk", col("rnk").cast("long"))
      .sortedSmall("qid", "rnk")
  }

  val e18Oracle: String =
    """WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      |           FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
      |      FROM embeddings),
      |p AS (SELECT qid, cid,
      |        round(list_inner_product(qe, ce), 4) AS dot_r
      |      FROM q, c WHERE cid <> qid),
      |r AS (SELECT qid, cid, dot_r,
      |        row_number() OVER (PARTITION BY qid
      |                           ORDER BY dot_r DESC, cid) AS rnk
      |      FROM p)
      |SELECT qid, cid, dot_r, rnk FROM r WHERE rnk <= 10
      |ORDER BY qid, rnk""".stripMargin

  val all: Seq[Q] = Seq(
    Q("e18_mips_topk", e18MipsTopK, Some(e18Oracle)))
}
