package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Md5Hex, Md5Lanes, VecDot, VecNorm}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so the SQL front-end (ops.Sql)
  * and any `spark.sql` user can call them by name — the same expressions
  * the DataFrame API exposes through graft.functions.
  *
  * Two activation paths:
  *   - config: `spark.sql.extensions=graft.GraftExtensions` (spark-submit /
  *     session builder), the standard extension mechanism;
  *   - programmatic: `GraftExtensions.register(spark)` for an already-built
  *     session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(graft.plans.RepairUnderParallelGenerate)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    children => {
      if (children.size != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${children.size}")
      build(children)
    }

  private[graft] val registrations
      : Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_md5",
      info("graft_md5", "graft_md5(str) - md5 hex digest (thread-local, codegen'd)"),
      arity("graft_md5", 1)(c => Md5Hex(c.head))),
    ("graft_md5_lanes",
      info("graft_md5_lanes", "graft_md5_lanes(str) - 8 minhash lanes from 2 md5 digests"),
      arity("graft_md5_lanes", 1)(c => Md5Lanes(c.head))),
    ("graft_vec_dot",
      info("graft_vec_dot", "graft_vec_dot(a, b) - double dot product of float vectors"),
      arity("graft_vec_dot", 2)(c => VecDot(c.head, c(1)))),
    ("graft_vec_norm",
      info("graft_vec_norm", "graft_vec_norm(a) - double L2 norm of a float vector"),
      arity("graft_vec_norm", 1)(c => VecNorm(c.head))))

  /** Register into an existing session's function registry (same builders
    * the extension injects). */
  def register(s: SparkSession): Unit =
    registrations.foreach { case (name, i, builder) =>
      s.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }

  /** Install the optimizer rules on an already-built session (the
    * config-path equivalent is `spark.sql.extensions=graft.GraftExtensions`). */
  def registerOptimizer(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.RepairUnderParallelGenerate]))
      s.experimental.extraOptimizations ++=
        Seq(graft.plans.RepairUnderParallelGenerate(s))
}
