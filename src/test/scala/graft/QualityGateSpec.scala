package graft

import org.scalatest.funsuite.AnyFunSuite

/** The q55 gate must exercise BOTH outcomes on the shipped corpus: the
  * structural checks hold (FKs intact, keys unique, domains valid) while
  * the consistency checks genuinely fire — an all-zeros report would
  * prove nothing about the violation paths.
  */
class QualityGateSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows =
    ops.Quality.q55QualityGate(spark, sf).collect()
      .map(r => r.getAs[String]("check") ->
        (r.getAs[Long]("n_violations"), r.getAs[Long]("n_checked"))).toMap

  test("structural checks pass on the corpus") {
    for (c <- Seq("fk_orphan_orders", "fk_orphan_lineitem",
        "pk_dup_orders", "neg_quantity")) {
      assert(rows(c)._1 == 0L, s"$c unexpectedly fired: ${rows(c)}")
      assert(rows(c)._2 > 0L, s"$c checked nothing")
    }
  }

  test("consistency checks fire on the corpus (non-zero paths exercised)") {
    for (c <- Seq("ship_before_order", "totalprice_mismatch")) {
      assert(rows(c)._1 > 0L, s"$c found no violations — gate untested")
    }
    // ship dates are mixed (some orders ship on time), so this check must
    // separate rows; totalprice is generator-independent of lineitem sums
    // and legitimately flags every order — the report states it, the gate
    // doesn't hide it.
    val sb = rows("ship_before_order")
    assert(sb._1 < sb._2, "ship_before_order flagged every row")
  }
}
