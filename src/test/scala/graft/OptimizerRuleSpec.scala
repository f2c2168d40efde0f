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

/** The stats guard: a relation larger than one file split must never be
  * touched — at production scale the rule is silent. */
class OptimizerRuleGuardSpec extends AnyFunSuite {
  import TestSpark._

  test("rule is silent on a relation wider than one split") {
    GraftExtensions.registerOptimizer(spark)
    // spark.range stats = 8 bytes/row: 100M rows = 800 MB >> 128 MB split
    val big = spark.range(100L * 1000 * 1000)
      .select(col("id"), explode(array(col("id"), col("id") + 1)).as("x"))
    val reps = big.queryExecution.optimizedPlan
      .collect { case r: org.apache.spark.sql.catalyst.plans.logical
        .RepartitionOperation => r }
    assert(reps.isEmpty, s"rule fired on a large relation:\n${big.queryExecution.optimizedPlan}")
  }
}
