package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.expr.Exprs._
import graft.ops.Out._
import graft.tables.Tables._

/** Skew handling for heavy-hitter group keys.
  *
  * AQE's skew-join splitting covers joins; aggregations over skewed keys
  * still funnel every row of a hot key through one reducer. Two-phase salted
  * aggregation bounds any reducer's share to 1/salts of a hot key: phase 1
  * aggregates on (key, salt), phase 2 merges partials on key. Works for any
  * algebraic aggregate (sum/count/min/max); the salt is derived
  * deterministically from the value column so re-runs are stable.
  */
object Skew {

  /** `entropy` must vary within a hot key (a row id, offset, or several
    * columns hashed together) — salting on the value itself collapses when
    * the hot key's values are constant. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int, entropy: Column): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(entropy), lit(salts)).as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("salted_sum"))

  def saltedCount(df: DataFrame, key: Column, salts: Int,
      entropy: Column): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(entropy), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("salted_count"))

  // --- q52: AQE skew-join splitting ------------------------------------

  /** Deterministic heavy-hitter derivation: ~90% of lineitem rows
    * collapse onto key -1 (no real order key is negative — orderkeys
    * start at 0), the rest keep their (multiple-of-10) order key — the
    * one-hot-customer / one-hot-day shape that wrecks a plain shuffle
    * join at scale. */
  private def skewKey: Column =
    when(col("l_orderkey") % 10 =!= 0, lit(-1L))
      .otherwise(col("l_orderkey"))

  /** The skewed fact⋈dim join, pre-aggregation — exposed so the spec can
    * run it under production-shaped AQE skew thresholds and assert the
    * hot partition actually SPLITS (`skew=true` on the sort-merge join).
    * MERGE hints pin the join strategy: broadcasting the dim would dodge
    * the skew rather than handling it, and at 100 TB the dim of a real
    * hot-key join is not always broadcastable. */
  private[graft] def skewedJoin(s: SparkSession, dir: String): DataFrame = {
    // AQE splits a skewed reduce partition by MAP-OUTPUT ranges, so a
    // split needs multiple mappers feeding the join's shuffle. A 100 TB
    // fact scan has thousands; the single-row-group test files have ONE,
    // which makes every reduce partition atomic. The round-robin
    // repartition restores the many-mapper layout the operator is
    // designed for (and is what the corpus layout would provide for
    // free at scale).
    val fact = lineitem(s, dir)
      .select(skewKey.as("k"), col("l_extendedprice"))
      .repartition(s.sparkContext.defaultParallelism)
    val dim = orders(s, dir)
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"),
        col("o_orderpriority").as("label"))
      .unionAll(s.range(1)
        .select(lit(-1L).as("k"), lit("HOT").as("label")))
    fact.hint("MERGE").join(dim.hint("MERGE"), "k")
  }

  /** q52: revenue by priority label over the skewed join. Without AQE
    * skew splitting, one reducer owns ~90% of the fact rows and the join
    * runs at straggler speed; with it (the spec's thresholds, or real
    * 100 TB partition sizes against the production 256 MB threshold) the
    * hot partition fans out across cores. The answer is
    * strategy-independent — the oracle is the plain join. */
  def q52SkewJoin(s: SparkSession, dir: String): DataFrame =
    skewedJoin(s, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_items"),
        lsum(col("l_extendedprice")).as("revenue"))
      .sortedSmall("label")

  val q52Oracle: String =
    s"""WITH fact AS (SELECT CASE WHEN l_orderkey % 10 <> 0 THEN -1
       |    ELSE l_orderkey END AS k, l_extendedprice FROM lineitem),
       |dim AS (SELECT o_orderkey AS k, o_orderpriority AS label
       |        FROM orders WHERE o_orderkey % 10 = 0
       |        UNION ALL SELECT -1, 'HOT')
       |SELECT d.label, COUNT(*) AS n_items,
       |${dsumSql("l_extendedprice")} AS revenue
       |FROM fact f JOIN dim d ON f.k = d.k
       |GROUP BY 1 ORDER BY label""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q52_skew_join", q52SkewJoin, Some(q52Oracle)))
}
