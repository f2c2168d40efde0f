package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Final-output ordering for bounded result sets.
  *
  * A plain `orderBy` plans a range-partitioned global sort whose sampling
  * pass re-executes the child plan — measured locally, sorting an
  * aggregation's output doubled the whole query's runtime. Every gate query
  * returns a bounded "report" (≤ ~150k rows even at bench scale), so the
  * right plan is: one shuffle to a single partition + in-partition sort.
  * Upstream stages keep full parallelism (repartition, unlike coalesce,
  * does not collapse them).
  *
  * Not for unbounded outputs — a 100 TB-scale result would use orderBy (or
  * no final sort at all, leaving ordering to the consumer).
  */
object Out {
  implicit class RichOut(private val df: DataFrame) extends AnyVal {
    def sortedSmall(cols: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
    def sortedSmall(first: String, rest: String*): DataFrame =
      sortedSmall((first +: rest).map(col): _*)

    /** Final ordering for UNBOUNDED result sets — anything whose row count
      * scales with the input (per-row transforms, per-key reports over
      * input-sized key domains, candidate-pair lists, time-range windows).
      * A `repartition(1)` sink on those is a single-partition funnel at
      * 100 TB; the distributed range sort keeps every executor writing.
      *
      * The child is persisted first: a range sort runs a sampling job
      * over its input before the shuffle, and without materialization
      * that re-executes the whole upstream plan (measured 2× on the
      * digest-heavy queries). The result set is being materialized for
      * output anyway, so caching it costs one copy of the data being
      * sorted — the same budget any engine's external sort spends. */
    def sortedWide(cols: Column*): DataFrame =
      df.persist().orderBy(cols: _*)
    def sortedWide(first: String, rest: String*): DataFrame =
      sortedWide((first +: rest).map(col): _*)
  }
}
