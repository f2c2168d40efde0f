package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for heavy-hitter group keys.
  *
  * AQE's skew-join splitting covers joins; aggregations over skewed keys
  * still funnel every row of a hot key through one reducer. Two-phase salted
  * aggregation bounds any reducer's share to 1/salts of a hot key: phase 1
  * aggregates on (key, salt), phase 2 merges partials on key. Works for any
  * algebraic aggregate (sum/count/min/max); the salt is derived
  * deterministically from the value column so re-runs are stable.
  */
object Skew {

  /** `entropy` must vary within a hot key (a row id, offset, or several
    * columns hashed together) — salting on the value itself collapses when
    * the hot key's values are constant. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
      salts: Int, entropy: Column): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(entropy), lit(salts)).as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("salted_sum"))

  def saltedCount(df: DataFrame, key: Column, salts: Int,
      entropy: Column): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(entropy), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("salted_count"))
}
