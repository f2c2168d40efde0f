package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bucketed

/** q54's claim is a plan property: the year-partitioned fact scan must be
  * pruned by a runtime subquery fed from the dimension filter
  * (`dynamicpruningexpression` in PartitionFilters) — the dim-driven half
  * of partition pruning that q51's literal predicate cannot show. Answer
  * invariance with DPP disabled proves the pruning is an optimization,
  * not a semantics change.
  */
class DppSpec extends AnyFunSuite {
  import TestSpark._

  test("the fact scan is pruned by a dynamicpruning expression at runtime") {
    val j = Bucketed.dppJoin(spark, sf)
    // collect() finalizes THIS QueryExecution's adaptive plan (the
    // SkewJoinSpec lesson — a sink would plan its own).
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "fact scan not dynamically pruned:\n" + plan.take(3000))
  }

  test("q54's answer is identical with DPP disabled") {
    val k = "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    val saved = spark.conf.get(k)
    val off =
      try {
        spark.conf.set(k, "false")
        Bucketed.q54DynamicPruning(spark, sf).collect().toSeq
      } finally spark.conf.set(k, saved)
    val on = Bucketed.q54DynamicPruning(spark, sf).collect().toSeq
    assert(off == on)
  }
}
