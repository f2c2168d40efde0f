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

  private val pidCol = "_graft_pid"

  /** Pass 1: range-repartition on the sort key, tag rows with their
    * partition id, and persist (pass 2 must observe exactly the
    * partitioning pass 1 measured — range boundaries come from sampling
    * and are not reproducible across re-executions). */
  private def rangeParted(df: DataFrame, order: Seq[Column]): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    df.repartitionByRange(n, order: _*)
      .withColumn(pidCol, spark_partition_id())
      .persist()
  }

  /** Pass 2 driver step, shared by rank and prefix sum: collect one
    * aggregate value per partition, turn the values into exclusive
    * cumulative offsets, and return (pid -> offset as a literal map-lookup
    * Column — one small codegen'd expression, no join, no second
    * shuffle; plus the grand total). */
  private def partitionOffsets(perPartition: Array[(Int, Long)]): (Column, Long) = {
    val sorted = perPartition.sortBy(_._1)
    val offsets = sorted.scanLeft((0, 0L)) { case ((_, acc), (p, c)) => (p, acc + c) }
    val entries = sorted.map(_._1).zip(offsets.map(_._2))
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }
    val offsetExpr =
      if (entries.isEmpty) lit(0L)
      else element_at(map(entries.toSeq: _*), col(pidCol))
    (offsetExpr, sorted.map(_._2).sum)
  }

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
    val parted = rangeParted(df, order)
    val counts = parted.groupBy(col(pidCol)).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val (offsetExpr, total) = partitionOffsets(counts)
    val w = Window.partitionBy(col(pidCol)).orderBy(order: _*)
    val ranked = parted
      .withColumn(rankCol, row_number().over(w).cast("long") + offsetExpr)
      .drop(pidCol)
    (ranked, total)
  }

  /** Distributed exclusive prefix sum of `value` (a long column) in the
    * total order given by `order` — same two-pass shape as the rank:
    * range-repartition + persist, per-partition totals → cumulative
    * offsets on the driver, then a per-partition running sum plus the
    * partition's offset. Exact for integral values under any
    * partitioning. */
  def withPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String): DataFrame = {
    val v = "_graft_v"
    val parted = rangeParted(df.withColumn(v, value), order)
    val totals = parted.groupBy(col(pidCol))
      .agg(coalesce(sum(col(v)), lit(0L)).as("t")).collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    val (offsetExpr, _) = partitionOffsets(totals)
    val w = Window.partitionBy(col(pidCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn(outCol,
        coalesce(sum(col(v)).over(w), lit(0L)) + offsetExpr)
      .drop(pidCol, v)
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
