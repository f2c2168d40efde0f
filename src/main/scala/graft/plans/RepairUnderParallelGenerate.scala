package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, LogicalPlan, Repartition, RepartitionOperation}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule automating the round-4 lesson (PLANS.md): a `Generate`
  * (explode) fed by a small-by-bytes relation is planned with the scan's
  * split count — one split for a few-MB parquet file — so the explode's
  * output fanout (shingles, chunks, n-grams: 100-1000×) runs on ONE core
  * no matter how wide the cluster is. Split counts follow input bytes;
  * they cannot see output fanout.
  *
  * The rule inserts a round-robin `Repartition(defaultParallelism)` below
  * any Generate whose subtree (a) carries no shuffle of its own — if ANY
  * repartition/shuffle-producing operator is already present the planner
  * or the user has made a choice we must not override — and (b) has
  * statistics under one file-split's bytes, i.e. exactly the case where
  * the scan CANNOT parallelize by itself. At production scale the stats
  * guard keeps the rule silent: a multi-split relation never matches.
  *
  * This is the `Rule[LogicalPlan]` escape hatch of the SURVEY §7
  * preference ladder: the DataFrame-level fix (`ops.Par.fanOut`) is still
  * what the library's own operators use — the rule exists so ad-hoc SQL
  * and notebook users of the session get the repair for free. */
case class RepairUnderParallelGenerate(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def smallScanOnly(p: LogicalPlan): Boolean = {
    val noShuffleYet = p.collectFirst {
      case r: RepartitionOperation => r
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty
    noShuffleYet &&
      p.stats.sizeInBytes <= conf.filesMaxPartitionBytes
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case g @ Generate(_, _, _, _, _, child) if smallScanOnly(child) =>
      g.copy(child = Repartition(
        spark.sparkContext.defaultParallelism, shuffle = true, child))
  }
}
