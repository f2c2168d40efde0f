package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps

/** s16 linear attribution and s17 Markov stationary distribution: both
  * must match driver-side recomputes from the raw event stream, and the
  * integer arithmetic must conserve what it claims to conserve. */
class AttributionSpec extends AnyFunSuite {
  import TestSpark._

  private def ev() = graft.tables.Tables.events(spark, sf)
    .selectExpr("user_id", "ts div 1000000000 AS sec", "event_id",
      "event_type", "value")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4)))

  test("s16 credit rollup matches a direct per-conversion recompute") {
    val rows = ev()
    val touches = rows.filter(r => r._4 == "click" || r._4 == "view")
    val purchases = rows.filter(_._4 == "purchase")
    // per purchase: the touch set within the hour before it
    val per = purchases.map { p =>
      val ts = touches.filter(t =>
        t._1 == p._1 && t._2 < p._2 && p._2 <= t._2 + 3600L)
      (p, ts)
    }.filter(_._2.nonEmpty)
    val expect = per.flatMap { case (p, ts) =>
      val n = ts.length.toLong
      val cents = math.floor(p._5 * 100 + 0.5).toLong
      ts.map(t => (t._4, p._3, 1000000L / n, cents / n))
    }.groupBy(_._1).map { case (tt, hits) =>
      tt -> (hits.length.toLong, hits.map(_._2).distinct.length.toLong,
        hits.map(_._3).sum, hits.map(_._4).sum)
    }
    val r = EventOps.s16LinearAttribution(spark, sf).collect()
    assert(r.map(_.getString(0)).toSet == expect.keySet)
    r.foreach { x =>
      val (nt, nc, ppm, cents) = expect(x.getString(0))
      assert(x.getLong(1) == nt, s"${x.getString(0)} touches")
      assert(x.getLong(2) == nc, s"${x.getString(0)} conversions")
      assert(x.getLong(3) == ppm, s"${x.getString(0)} credit ppm")
      assert(x.getLong(4) == cents, s"${x.getString(0)} credit cents")
    }
    // a conversion's total ppm credit can round DOWN but never exceed 1e6
    // per conversion: suite-wide bound
    val totPpm = r.map(_.getLong(3)).sum
    val nConvTouched = per.length.toLong
    assert(totPpm <= 1000000L * nConvTouched)
    assert(totPpm > 1000000L * nConvTouched - nConvTouched * 5,
      "floor loss exceeds one ulp per touch set")
    // multi-touch conversions must exist, or linear == last-touch here
    assert(per.exists(_._2.length >= 2), "no multi-touch conversion")
  }

  test("s17 integer stationary distribution tracks the double-precision chain and conserves mass") {
    val rows = ev()
    val states = rows.map(_._4).distinct.sorted
    val k = states.length
    val idx = states.zipWithIndex.toMap
    val c = Array.ofDim[Long](k, k)
    rows.groupBy(_._1).foreach { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2)
        .filter(_.length == 2)
        .foreach(p => c(idx(p(0)))(idx(p(1))) += 1)
    }
    val rowTot = c.map(_.sum.toDouble)
    // double-precision reference chain, same 8 rounds
    var piD = Array.fill(k)(1.0 / k)
    (1 to 8).foreach { _ =>
      piD = Array.tabulate(k)(j =>
        (0 until k).map(i =>
          piD(i) * (if (rowTot(i) == 0) 0.0
                    else c(i)(j) / rowTot(i))).sum)
    }
    val r = EventOps.s17MarkovStationary(spark, sf).collect()
    assert(r.length == k)
    r.foreach { x =>
      val pd = piD(idx(x.getString(0)))
      // integer ppm chain floors twice per round: stay within 100 ppm
      assert(math.abs(x.getLong(3) - pd * 1e6) < 100,
        s"${x.getString(0)}: ppm ${x.getLong(3)} vs double ${pd * 1e6}")
      assert(x.getLong(4) == x.getLong(3) - x.getLong(2), "drift = st - obs")
    }
    // floored mass: ≤ 1e6, and within k·rounds ppm of it
    val mass = r.map(_.getLong(3)).sum
    assert(mass <= 1000000L)
    assert(mass > 1000000L - 100L * k)
    // observed shares come from the same corpus
    assert(r.map(_.getLong(1)).sum == rows.length.toLong)
  }
}
