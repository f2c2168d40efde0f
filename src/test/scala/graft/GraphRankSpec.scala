package graft

import org.scalatest.funsuite.AnyFunSuite

/** t43 invariants: the damping floor is exact for isolated documents
  * (their rank is untouched by any iteration), every rank sits on or
  * above the floor, and concentration happens only through edges — the
  * top-ranked document must be connected.
  */
class GraphRankSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows =
    ext.TextOps3.t43GraphRank(spark, sf).collect()

  test("isolated documents settle exactly at the damping floor") {
    val isolated = rows.filter(_.getAs[Long]("deg") == 0L)
    assert(isolated.nonEmpty, "corpus has no isolated documents")
    isolated.foreach { r =>
      assert(r.getAs[Long]("rank_ppm") == 150000L,
        s"doc ${r.getAs[Long]("doc_id")} drifted off the floor")
    }
  }

  test("ranks are bounded below by the floor and concentrate via edges") {
    assert(rows.forall(_.getAs[Long]("rank_ppm") >= 150000L))
    val top = rows.maxBy(_.getAs[Long]("rank_ppm"))
    assert(top.getAs[Long]("deg") > 0L,
      "top-ranked document has no edges")
    assert(top.getAs[Long]("rank_ppm") > 150000L,
      "no rank concentration anywhere — edge set empty?")
  }
}
