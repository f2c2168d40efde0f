package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.tables.Tables._
import graft.ops.Out._

/** q55: the data-quality gate a production pipeline runs before promoting
  * a corpus snapshot (dbt-test / Deequ-style expectations, engine-native):
  * referential integrity, key uniqueness, domain checks, and two
  * cross-table consistency invariants — one row per check with violation
  * and checked counts, so the gate is both a report and an assertable
  * contract. This corpus genuinely fails two checks (ship-before-order
  * and order-total drift), so the gate exercises non-zero paths.
  *
  * Scale shape: every check is one aggregation over one scan or one
  * equi-join — FK probes are left joins flagged null (left unhinted:
  * Catalyst broadcasts the dimension-sized key side on its own here, and
  * at 100 TB the same plan degrades gracefully to a shuffle join or a
  * bloom-filter pre-pass), uniqueness is a keyed
  * groupBy, and the consistency checks accumulate integer cents so both
  * engines compare exactly (no double-sum order dependence). The six
  * one-row aggregates union into the report — independent stages, no
  * stage ever corpus × corpus.
  */
object Quality {

  /** Exact integer cents via explicit half-up (the e08 recipe — identical
    * IEEE sequence in both engines, no round() mode ambiguity). */
  private def cents(c: Column): Column =
    floor(c * 100.0 + 0.5).cast("long")

  private def report(name: String, viol: Column, checked: Column)(
      src: DataFrame): DataFrame =
    src.agg(viol.as("n_violations"), checked.as("n_checked"))
      .select(lit(name).as("check"),
        col("n_violations").cast("long"),
        col("n_checked").cast("long"))

  def q55QualityGate(s: SparkSession, dir: String): DataFrame = {
    val c = customer(s, dir)
    val o = orders(s, dir)
    val l = lineitem(s, dir)

    // No broadcast hint: the key side is dimension-sized here and Catalyst
    // broadcasts it on its own; at 100 TB the same plan degrades gracefully
    // to a shuffle join instead of being pinned into an oversized broadcast.
    val fkOrders = report("fk_orphan_orders",
      sum(when(col("c_custkey").isNull, 1L).otherwise(0L)), count(lit(1)))(
      o.select(col("o_custkey"))
        .join(c.select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left"))

    val fkLineitem = report("fk_orphan_lineitem",
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)), count(lit(1)))(
      l.select(col("l_orderkey"))
        .join(o.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left"))

    val pkDup = report("pk_dup_orders",
      sum(when(col("n") > 1, 1L).otherwise(0L)), count(lit(1)))(
      o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n")))

    val negQty = report("neg_quantity",
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)), count(lit(1)))(l)

    val shipBefore = report("ship_before_order",
      sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L)),
      count(lit(1)))(
      l.select(col("l_orderkey"), col("l_shipdate"))
        .join(o.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey")))

    val itemSums = l.groupBy(col("l_orderkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("s_cents"))
    val totalDrift = report("totalprice_mismatch",
      sum(when(abs(cents(col("o_totalprice")) - col("s_cents")) > 1, 1L)
        .otherwise(0L)),
      count(lit(1)))(
      o.select(col("o_orderkey"), col("o_totalprice"))
        .join(itemSums, col("o_orderkey") === col("l_orderkey")))

    fkOrders.union(fkLineitem).union(pkDup).union(negQty)
      .union(shipBefore).union(totalDrift)
      .sortedSmall("check")
  }

  val q55Oracle: String =
    """WITH fk_o AS (
      |  SELECT 'fk_orphan_orders' AS "check",
      |    CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
      |      AS n_violations,
      |    COUNT(*) AS n_checked
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
      |fk_l AS (
      |  SELECT 'fk_orphan_lineitem',
      |    CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT),
      |    COUNT(*)
      |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |pk AS (
      |  SELECT 'pk_dup_orders',
      |    CAST(COUNT(*) FILTER (WHERE n > 1) AS BIGINT), COUNT(*)
      |  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)),
      |nq AS (
      |  SELECT 'neg_quantity',
      |    CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT), COUNT(*)
      |  FROM lineitem),
      |sb AS (
      |  SELECT 'ship_before_order',
      |    CAST(COUNT(*) FILTER (WHERE l.l_shipdate < o.o_orderdate)
      |      AS BIGINT),
      |    COUNT(*)
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |isum AS (
      |  SELECT l_orderkey,
      |    SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS s
      |  FROM lineitem GROUP BY 1),
      |td AS (
      |  SELECT 'totalprice_mismatch',
      |    CAST(COUNT(*) FILTER (WHERE abs(
      |      CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) - isum.s)
      |        > 1) AS BIGINT),
      |    COUNT(*)
      |  FROM orders o JOIN isum ON o.o_orderkey = isum.l_orderkey)
      |SELECT "check", n_violations, n_checked FROM (
      |  SELECT * FROM fk_o UNION ALL SELECT * FROM fk_l
      |  UNION ALL SELECT * FROM pk UNION ALL SELECT * FROM nq
      |  UNION ALL SELECT * FROM sb UNION ALL SELECT * FROM td)
      |ORDER BY "check"""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q55_quality_gate", q55QualityGate, Some(q55Oracle)))
}
