package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps

/** s15 behavioral trigram mining: the pattern counts must match a
  * driver-side recompute from raw per-user timelines, and the top-20
  * selection must respect the (count DESC, lexicographic) contract. */
class EventMiningSpec extends AnyFunSuite {
  import TestSpark._

  test("s15 trigram counts and support match a direct recompute; top-20 ordering holds") {
    val ev = graft.tables.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3)
        .filter(_.length == 3)
        .map(t => ((t(0), t(1), t(2)), user))
    }.groupBy(_._1).map { case (pat, hits) =>
      pat -> (hits.size.toLong, hits.map(_._2).distinct.size.toLong)
    }
    val top = expect.toSeq
      .sortBy { case ((a, b, c), (n, _)) => (-n, a, b, c) }.take(20)
    val r = EventOps.s15BehaviorNgrams(spark, sf).collect()
    assert(r.length == math.min(20, expect.size))
    r.zip(top).foreach { case (x, ((a, b, c), (n, u))) =>
      assert((x.getString(0), x.getString(1), x.getString(2)) == ((a, b, c)))
      assert(x.getLong(3) == n, s"walks for $a>$b>$c")
      assert(x.getLong(4) == u, s"users for $a>$b>$c")
    }
    // support can never exceed occurrences, and both must discriminate
    assert(r.forall(x => x.getLong(4) <= x.getLong(3)))
    assert(r.map(_.getLong(3)).distinct.length > 1)
  }
}
