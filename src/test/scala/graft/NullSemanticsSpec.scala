package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-key join parity (SURVEY §7.4): the reference's pandas `isin`/`~isin`
  * is null-insensitive set membership — exactly Spark's left_semi/left_anti,
  * and NOT SQL `IN`/`NOT IN` (whose three-valued NULL logic silently drops
  * every row when the subquery contains a NULL). These specs pin the
  * semantics the pipeline relies on. */
class NullSemanticsSpec extends AnyFunSuite {
  import TestSpark._

  private def frames = {
    import spark.implicits._
    val left = Seq(Some(1L), Some(2L), None, Some(4L)).toDF("id")
    val right = Seq(Some(2L), None).toDF("id")
    (left, right)
  }

  test("left_anti keeps null-keyed rows (pandas ~isin semantics)") {
    val (left, right) = frames
    val anti = left.join(right, Seq("id"), "left_anti")
      .collect().map(r => Option(r.get(0)))
    // 1 and 4 don't match; the null row matches nothing → kept
    assert(anti.toSet == Set(Some(1L), Some(4L), None))
  }

  test("left_semi never matches on null keys (pandas isin semantics)") {
    val (left, right) = frames
    val semi = left.join(right, Seq("id"), "left_semi")
      .collect().map(_.getLong(0))
    assert(semi.toSeq == Seq(2L))
  }

  test("NOT IN with a null in the subquery drops everything — the trap") {
    val (left, right) = frames
    left.createOrReplaceTempView("nn_left")
    right.createOrReplaceTempView("nn_right")
    val notIn = spark.sql(
      "SELECT id FROM nn_left WHERE id NOT IN (SELECT id FROM nn_right)")
    assert(notIn.count() == 0) // why psn.Ops uses left_anti, never NOT IN
  }

  test("anti ∪ semi partitions the non-null rows, and null rows go anti") {
    val (left, right) = frames
    val anti = left.join(right, Seq("id"), "left_anti").count()
    val semi = left.join(right, Seq("id"), "left_semi").count()
    assert(anti + semi == left.count())
  }
}
