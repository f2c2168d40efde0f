package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps

/** Invariants of s14 rolling active users. Exact-value parity is gated by
  * the DuckDB oracle at sf0.01; here we check the rolling-distinct
  * semantics against a direct per-day recomputation. */
class RollingActiveSpec extends AnyFunSuite {
  import TestSpark._

  test("s14: wau bounds dau; every active day present; spot days match a direct distinct count") {
    val r = EventOps.s14RollingActive(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getLong(0) % 86400 == 0)
      assert(x.getLong(2) >= x.getLong(1), "wau >= dau always")
    }
    val du = graft.tables.Tables.events(spark, sf)
      .select(expr("(ts div 1000000000) div 86400").as("day"),
        col("user_id"))
      .distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val days = du.map(_._1).distinct.sorted
    assert(r.map(_.getLong(0)).toSeq == days.map(_ * 86400).toSeq,
      "one row per active day, in order")
    // Direct recompute on the first, middle, and last anchor day.
    val byDay = r.map(x => x.getLong(0) / 86400 -> (x.getLong(1), x.getLong(2))).toMap
    Seq(days.head, days(days.length / 2), days.last).foreach { d =>
      val dau = du.count(_._1 == d).toLong
      val wau = du.filter(p => p._1 >= d - 6 && p._1 <= d)
        .map(_._2).distinct.length.toLong
      assert(byDay(d) == ((dau, wau)), s"day $d: ${byDay(d)} != ($dau, $wau)")
    }
    // The first active day has no trailing history: wau == dau there.
    assert(byDay(days.head)._1 == byDay(days.head)._2)
  }
}
