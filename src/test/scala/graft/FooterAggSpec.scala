package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet aggregate pushdown: COUNT/MIN/MAX over an unfiltered scan can
  * be answered from file footers alone — at 100 TB the difference between
  * a full-corpus read and a metadata walk. The v2 parquet source supports
  * it behind two confs; this spec proves the plan actually carries
  * `PushedAggregation` (the scan returns pre-aggregated rows) and that
  * the answer matches the default full-scan path bit-for-bit.
  */
class FooterAggSpec extends AnyFunSuite {
  import TestSpark._

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def statsQuery() =
    spark.read.parquet(s"$sf/orders.parquet")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))

  test("count/min/max are answered from parquet footers (PushedAggregation)") {
    val (plan, pushed) = withConfs(
      // parquet is on the v1 list by default; aggregate pushdown is a
      // v2-scan feature.
      "spark.sql.sources.useV1SourceList" -> "avro,csv,json,kafka,orc,text",
      "spark.sql.parquet.aggregatePushdown" -> "true") {
      val df = statsQuery()
      val rows = df.collect()
      (df.queryExecution.executedPlan.toString, rows.toSeq)
    }
    assert(plan.contains("PushedAggregation"),
      "aggregate did not reach the scan:\n" + plan.take(3000))
    val full = statsQuery().collect().toSeq
    assert(pushed == full,
      s"footer-stats answer diverged: $pushed vs $full")
  }
}
