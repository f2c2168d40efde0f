package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextOps3
import graft.ops.Bucketed

/** Invariants for the third text-ops wave (t36-t38) and the bucketed
  * co-located join (q50). Exact-value parity is gated by the DuckDB
  * oracle at sf0.01; here we check the guarantees the operators are FOR:
  * the CMS overestimate contract, LM score bounds, the per-source cap,
  * and — the whole point of q50 — the exchange-free physical plan. */
class TextOps3Spec extends AnyFunSuite {
  import TestSpark._

  test("t36 CMS never underestimates (over_cnt >= 0 on every probe)") {
    val r = TextOps3.t36CmsFrequency(spark, sf)
      .select("exact_cnt", "est_cnt", "over_cnt").collect()
    assert(r.length == 20)
    assert(r.forall(x => x.getLong(2) >= 0L), "CMS underestimated a count")
    assert(r.forall(x => x.getLong(1) == x.getLong(0) + x.getLong(2)))
  }

  test("t37 LM score is a mean conditional probability: 0 < ppm <= 1e6") {
    val r = TextOps3.t37LmScore(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val ppm = x.getLong(2)
      ppm > 0L && ppm <= 1000000L && x.getLong(1) > 0L
    })
  }

  test("t37 covers exactly the documents with >= 2 tokens") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(TextOps3.t37LmScore(spark, sf).count() == docs)
  }

  test("t38 keeps at most 15 per source and src_n is the true total") {
    val kept = TextOps3.t38SourceCap(spark, sf)
    val bad = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("k"), max(col("src_n")).as("n"))
      .join(
        graft.tables.Tables.documents(spark, sf)
          .groupBy(col("source")).agg(count(lit(1)).as("truth")),
        "source")
      .filter(col("k") > 15 || col("n") =!= col("truth") ||
        col("k") =!= least(col("truth"), lit(15)))
      .count()
    assert(bad == 0L)
  }

  test("q50 bucketed join plans with zero exchanges under a merge join") {
    val plan = Bucketed.bucketedJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join should not shuffle or broadcast:\n$plan")
  }

  test("q51 scan prunes at the partition level, not the row level") {
    val plan = Bucketed.prunedScan(spark, sf)
      .queryExecution.executedPlan.toString
    def segment(name: String): String =
      s"$name: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan)
        .map(_.group(1)).getOrElse("")
    assert(segment("PartitionFilters").contains("1997"),
      s"yr=1997 must be a partition filter, plan:\n$plan")
    assert(!segment("PushedFilters").contains("yr") &&
      !segment("DataFilters").contains("yr"),
      s"yr must not appear as a row-level filter:\n$plan")
  }

  test("q51 equals the unpartitioned filter + aggregation") {
    import graft.tables.Tables._
    val plain = orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        graft.expr.Exprs.lsum(col("o_totalprice")).as("revenue"))
    val got = Bucketed.q51PartitionPruning(spark, sf)
    assert(got.except(plain).isEmpty && plain.except(got).isEmpty)
  }

  test("q50 equals the plain (shuffled) join on the raw parquet") {
    import graft.tables.Tables._
    val plain = lineitem(spark, sf)
      .join(orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_items"),
        graft.expr.Exprs.lsum(col("l_extendedprice")).as("revenue"))
    val got = Bucketed.q50BucketedJoin(spark, sf)
    assert(got.except(plain).isEmpty && plain.except(got).isEmpty)
  }
}
