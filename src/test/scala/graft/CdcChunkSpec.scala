package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property t42's content-defined chunking exists for: a prefix
  * insertion shifts every FIXED-offset segment (t30's recipe) but only
  * the chunk it lands in under CDC — boundaries are functions of local
  * content, so downstream chunks re-align and keep dedup'ing.
  */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._

  // doc 2 = doc 1 with one token prepended; all tokens distinct so no
  // accidental content collisions.
  private val baseToks = (1 to 200).map(i => s"w$i")
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, baseToks.mkString(" ")),
      (2L, ("INSERTED" +: baseToks).mkString(" "))
    ).toDF("doc_id", "text")
  }

  test("CDC chunks re-align after a prefix insertion; fixed segments do not") {
    val chunks = ext.TextOps3.cdcChunksOf(docs)
      .select(col("doc_id"), col("h")).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("h")).toSet).toMap
    val h1 = chunks(1L)
    val h2 = chunks(2L)
    // Non-vacuity: the corpus hash actually produced cut tokens.
    assert(h1.size >= 2, "chosen tokens produced no CDC boundary")
    // Every doc-1 chunk except the one the insertion lands in (the first)
    // reappears verbatim in doc 2.
    assert((h1 -- h2).size <= 1,
      s"CDC failed to re-align: ${(h1 -- h2).size} of ${h1.size} lost")

    // Contrast: fixed 10-token segmentation shares NOTHING after the
    // same one-token shift (every slice's content moved by one).
    val segs = docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(10))).as("start"))
      .select(col("doc_id"),
        array_join(slice(col("t"), col("start") + 1, lit(10)), " ").as("seg"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[String]("seg")).toSet).toMap
    assert((segs(1L) intersect segs(2L)).isEmpty,
      "fixed segmentation unexpectedly survived the shift")
  }

  test("chunk token mass partitions the document") {
    val out = ext.TextOps3.t42Of(docs).collect()
    val byDoc = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    assert(byDoc(1L) == 200L)
    assert(byDoc(2L) == 201L)
  }
}
