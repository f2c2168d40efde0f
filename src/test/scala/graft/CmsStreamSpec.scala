package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps3

/** The count-min grid is a mergeable summary, so the SAME aggregation
  * runs as a streaming stateful query: state is the constant-size grid,
  * partial-aggregate merge is cell-wise addition. Three-way equality:
  * streaming grid == batch grid over raw tokens == t36's vocab-first
  * batch formulation (hash once per distinct token). */
class CmsStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def toks(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(split(col("text"), " ")).as("tok"))

  private def gridOf(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap

  test("streaming CMS grid equals both batch formulations") {
    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(sf)
    val q = TextOps3.cmsCellsOf(toks(stream))
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    val streaming = gridOf(spark.table("cms_stream").collect())
    val batchRaw = gridOf(
      TextOps3.cmsCellsOf(toks(
        graft.tables.Tables.documents(spark, sf))).collect())
    assert(streaming == batchRaw)
    assert(streaming.nonEmpty && streaming.size <= 4 * 1024)

    // vocab-first formulation: aggregate counts per token, then weight
    // each token's 4 cells by its count — t36's batch plan.
    val tokCnt = toks(graft.tables.Tables.documents(spark, sf))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val viaVocab = tokCnt.select(col("cnt"),
      explode(array((0 until 4).map { r =>
        val b = conv(substring(graft.functions.Md5Hex.graft_md5(
          concat(lit(s"cms$r:"), col("tok"))), 1, 8), 16, 10)
          .cast("long") % 1024
        struct(lit(r).as("r"), b.as("b"))
      }: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(sum(col("cnt")).as("cell"))
    assert(gridOf(viaVocab.collect()) == batchRaw)
  }
}
