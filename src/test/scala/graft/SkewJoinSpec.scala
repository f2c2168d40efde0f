package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** q52's claim is a plan property, not just an answer: under AQE skew
  * handling, the hot partition of the sort-merge join must actually SPLIT
  * (`skew=true` on the SMJ) instead of running at straggler speed. The
  * production thresholds (256 MB) never trip on test-sized data, so the
  * spec scales them down to the corpus — same detector, same splitter,
  * smaller constants — and asserts both the split and answer-invariance
  * against the default-config run. */
class SkewJoinSpec extends AnyFunSuite {
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

  test("the hot partition splits under AQE skew join (skew=true in SMJ)") {
    withConfs(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // ~90% of lineitem lands on one key; with the detector scaled to
      // the corpus the hot partition is both >2x the median and over
      // the byte threshold, so OptimizeSkewedJoin must split it.
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      // autoBroadcast stays on (MERGE hints pin the join); coalescing
      // off so partition stats reflect the raw shuffle.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val df = Skew.skewedJoin(spark, sf)
      // The assert must read the SAME QueryExecution that ran: collect()
      // finalizes df's own adaptive plan (a sink would plan its own).
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("skew=true"),
        "hot partition did not split:\n" + plan.take(2000))
    }
  }

  test("q52's answer is identical with and without skew splitting") {
    val split = withConfs(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      Skew.q52SkewJoin(spark, sf).collect().toSeq
    }
    val plain = Skew.q52SkewJoin(spark, sf).collect().toSeq
    assert(split == plain)
  }
}
