package graft

import org.scalatest.funsuite.AnyFunSuite

/** t45 non-vacuity and conservation: the greedy loop must actually
  * exercise multi-piece splits and the UNK path on this corpus (a
  * memorize-everything vocabulary would make the operator trivial), and
  * every word yields at least one unit of output.
  */
class WordpieceSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val rows =
    ext.TextOps3.t45WordpieceTokenize(spark, sf).collect()

  test("every word yields at least one piece or UNK char") {
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pieces") + r.getAs[Long]("n_unk_chars") >=
        r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("fertility_ppm") >= 0L)
    }
  }

  test("the top-K vocabulary does not memorize the corpus (loop exercised)") {
    val multi = rows.count(_.getAs[Long]("fertility_ppm") > 1000000L)
    val unk = rows.map(_.getAs[Long]("n_unk_chars")).sum
    assert(multi > 0 || unk > 0L,
      "every word tokenized as one piece — vocabulary memorized the corpus")
  }
}
