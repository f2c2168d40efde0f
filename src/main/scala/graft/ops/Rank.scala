package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * `Window.orderBy(...)` with no partitionBy moves the whole dataset to a
  * single partition (Spark logs "No Partition Defined for Window operation")
  * — a non-starter at 100 TB. This operator computes the same total-order
  * `row_number` in two distributed passes:
  *
  *   1. range-repartition on the sort key (parallel, Catalyst-planned) and
  *      persist, so pass 2 sees exactly the partitioning pass 1 counted
  *      (range boundaries come from sampling and would not be reproducible
  *      across re-executions otherwise);
  *   2. count rows per partition (a #partitions-row aggregate collected to
  *      the driver), turn the counts into cumulative offsets, and add the
  *      per-partition `row_number` (an already-sorted local window) to the
  *      broadcast offset of its partition.
  *
  * From the unique global rank, `ntile` / `cume_dist` / `percent_rank` are
  * plain arithmetic (the order key must be a total order — include a
  * tiebreaker column — so rank has no peer groups).
  */
object Rank {

  /** Adds `rankCol` (1-based long, dense total order) ordered by `order`.
    * The returned frame is persisted (pass 2 must reuse pass 1's range
    * partitioning); callers owning long pipelines should unpersist.
    */
  def withGlobalRank(df: DataFrame, order: Seq[Column], rankCol: String): DataFrame =
    withGlobalRankN(df, order, rankCol)._1

  /** As [[withGlobalRank]], also returning the total row count (free — it is
    * the sum of the per-partition counts pass 2 needs anyway), which the
    * rank-arithmetic helpers below take as `n`. */
  def withGlobalRankN(df: DataFrame, order: Seq[Column], rankCol: String): (DataFrame, Long) = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = "_graft_pid"
    val parted = df
      .repartitionByRange(n, order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val counts = parted.groupBy(col(pid)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, c)) => (p, acc + c) }
    val offsetOf = counts.map(_._1).zip(offsets.map(_._2)).toMap
    // pid -> offset as a literal map lookup: one small expression, codegen'd,
    // no join and no second shuffle.
    val entries = offsetOf.toSeq.sortBy(_._1)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    val offsetExpr =
      if (entries.isEmpty) lit(0L)
      else element_at(map(entries: _*), col(pid))
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
    val ranked = parted
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetExpr)
      .drop(pid)
    (ranked, counts.map(_._2).sum)
  }

  /** Distributed exclusive prefix sum of `value` (a long column) in the
    * total order given by `order` — same two-pass shape as the rank:
    * range-repartition + persist, per-partition totals → cumulative
    * offsets on the driver, then a per-partition running sum plus the
    * partition's offset. Exact for integral values under any
    * partitioning. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = "_graft_pid"
    val v = "_graft_v"
    val parted = df
      .withColumn(v, value)
      .repartitionByRange(n, order: _*)
      .withColumn(pid, spark_partition_id())
      .persist()
    val totals = parted.groupBy(col(pid)).agg(sum(col(v)).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (p, t)) => (p, acc + t) }
    val offsetOf = totals.map(_._1).zip(offsets.map(_._2)).toMap
    val entries = offsetOf.toSeq.sortBy(_._1)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    val offsetExpr =
      if (entries.isEmpty) lit(0L)
      else element_at(map(entries: _*), col(pid))
    val w = Window.partitionBy(col(pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn(outCol,
        coalesce(sum(col(v)).over(w), lit(0L)) + offsetExpr)
      .drop(pid, v)
  }

  /** ntile(buckets) from a unique 1-based rank over n rows (SQL semantics:
    * the first `n % buckets` tiles get the extra row). */
  def ntileFromRank(rank: Column, n: Long, buckets: Int): Column = {
    val base = n / buckets
    val rem = n % buckets
    val cut = (base + 1) * rem // ranks 1..cut fall in the rem larger tiles
    when(lit(base) === 0, rank.cast("long"))
      .when(rank <= cut, ceil(rank / (base + 1.0)))
      .otherwise(lit(rem) + ceil((rank - cut) / base.toDouble))
      .cast("long")
  }

  /** cume_dist from a unique rank (no peer groups): rank / n. */
  def cumeDistFromRank(rank: Column, n: Long): Column =
    rank.cast("double") / lit(n.toDouble)

  /** percent_rank from a unique rank: (rank - 1) / (n - 1). */
  def percentRankFromRank(rank: Column, n: Long): Column =
    when(lit(n) === 1, lit(0.0))
      .otherwise((rank - 1).cast("double") / lit((n - 1).toDouble))
}
