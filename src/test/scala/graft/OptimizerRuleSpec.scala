package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
import org.scalatest.funsuite.AnyFunSuite

/** The RepairUnderParallelGenerate optimizer rule: an explode over a
  * small single-split scan gets a round-robin repartition injected; a
  * plan that already shuffles is left alone; results are unchanged. */
class OptimizerRuleSpec extends AnyFunSuite {
  import TestSpark._

  private def explodePlan = {
    val d = graft.tables.Tables.documents(spark, sf)
    d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
  }

  test("rule injects a repartition under Generate on a small scan") {
    GraftExtensions.registerOptimizer(spark)
    val optimized = explodePlan.queryExecution.optimizedPlan
    val reps = optimized.collect { case r: RepartitionOperation => r }
    assert(reps.nonEmpty, s"no repartition injected:\n$optimized")
    // and it actually widens execution
    assert(explodePlan.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("rule leaves explicitly repartitioned plans alone") {
    GraftExtensions.registerOptimizer(spark)
    val d = graft.tables.Tables.documents(spark, sf).repartition(3)
    val p = d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val reps = p.queryExecution.optimizedPlan
      .collect { case r: RepartitionOperation => r }
    assert(reps.size == 1) // only the user's own
  }

  test("rule preserves results") {
    val before = explodePlan.groupBy("tok").count()
      .orderBy("tok").collect().toSeq
    GraftExtensions.registerOptimizer(spark)
    val after = explodePlan.groupBy("tok").count()
      .orderBy("tok").collect().toSeq
    assert(before == after)
  }
}
