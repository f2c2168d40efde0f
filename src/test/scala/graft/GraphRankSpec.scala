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

  test("rep-level rank equals the doc-level blow-up graph on a duplicated corpus") {
    import TestSpark.spark.implicits._
    // 7-fold duplicated corpus (the CanonPairsSpec recipe): every doc has
    // 6 exact copies, so the doc graph is a nontrivial blow-up of the rep
    // graph — cliques inside groups, complete bipartite between near-dup
    // groups.
    val base = graft.tables.Tables.documents(spark, sf)
      .limit(40).select("doc_id", "text").as[(Long, String)].collect()
    val dup = (0 until 7).flatMap(k =>
      base.map { case (id, t) => (id + k * 100000L, t, t.length.toLong) })
      .toDF("doc_id", "text", "n_chars")
    val (member, grpSz, repEdges) = ext.TextOps.repGraphStateOf(dup)
    val rep = ext.TextOps3.t43Core(member, grpSz, repEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val doc = ext.TextOps3.naiveGraphRank(dup)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rep.length == doc.length && rep.sameElements(doc),
      s"rep-level rank diverged from doc-level on ${rep.length} docs")
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
