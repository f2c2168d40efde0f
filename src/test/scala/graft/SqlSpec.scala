package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL front-end parity: the same logical queries through spark.sql over
  * registered views must equal the DataFrame formulations (one Catalyst
  * engine, two front-ends — mirroring the reference's shipped-SQL surface). */
class SqlSpec extends AnyFunSuite {
  import TestSpark._

  test("SQL q01 (pricing summary) equals the DataFrame plan") {
    val viaSql = graft.ops.Sql.run(spark, sf,
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    val viaDf = ops.Relational.q01PricingSummary(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(viaSql.exceptAll(viaDf).count() == 0)
    assert(viaDf.exceptAll(viaSql).count() == 0)
  }

  test("SQL semi/anti joins equal the DataFrame plans") {
    val sqlSemi = graft.ops.Sql.run(spark, sf,
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_orderkey IN
        |  (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)"""
        .stripMargin)
    val dfSemi = ops.Relational.q04SemiJoin(spark, sf)
    assert(sqlSemi.exceptAll(dfSemi).count() == 0)
    val sqlAnti = graft.ops.Sql.run(spark, sf,
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)
    val dfAnti = ops.Relational.q05AntiJoin(spark, sf)
    assert(sqlAnti.count() == dfAnti.count())
  }

  test("q20 HLL approx distinct lands within tolerance for every group") {
    val verdicts = ops.Relational.q20ApproxDistinct(spark, sf)
    assert(verdicts.count() > 0)
    assert(verdicts.filter(!col("parts_within_tol") ||
      !col("supps_within_tol")).count() == 0)
  }
}
