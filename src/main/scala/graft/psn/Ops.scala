package graft.psn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** The reference's relational pipeline as pure `DataFrame => DataFrame`
  * stages (SURVEY §7.1 module 4). Null semantics: semi/anti joins, never
  * IN/NOT IN, matching pandas isin behavior on null keys (SURVEY §7.4).
  *
  * Scale notes: all three stages key on `id` — at 100 TB the stored game
  * table is bucketed on id so these joins co-locate without a shuffle; the
  * current-ingest side is small (one API page per user) and broadcasts.
  */
object Ops {

  /** New-game detection: left-anti join on id (J2/P5; main.py:176). */
  def newGames(current: DataFrame, stored: DataFrame): DataFrame =
    current.join(stored.select(col("id")), Seq("id"), "left_anti")

  /** Play-time delta (J1+E1+P3+P1+E9; main.py:193-207): snapshot-vs-current
    * inner join, arithmetic diffs, keep positive play_count deltas, project,
    * stamp today-midnight. */
  def playTimeDeltas(stored: DataFrame, current: DataFrame): DataFrame = {
    val o = stored.select(col("id"), col("play_count").as("play_count_old"),
      col("play_duration").as("play_duration_old"))
    val n = current.select(col("id"), col("play_count").as("play_count_new"),
      col("play_duration").as("play_duration_new"))
    n.join(o, Seq("id"), "inner")
      .withColumn("play_count_diff",
        col("play_count_new") - col("play_count_old"))
      .withColumn("play_duration_diff",
        col("play_duration_new") - col("play_duration_old"))
      .filter(col("play_count_diff") > 0)
      .select(col("id"), col("play_count_diff"), col("play_duration_diff"))
      // Driver-computed literal, as the reference stamps once per run
      // (main.py:203) — an expression like date_trunc(current_timestamp())
      // would re-evaluate per action and could diverge between the count
      // and the append across a midnight boundary or cache eviction.
      .withColumn("date", lit(java.sql.Timestamp.valueOf(
        java.time.LocalDate.now().atStartOfDay())))
  }

  /** Games whose play time changed: left-semi join (J3/P4; main.py:243-246). */
  def gamesNeedingUpdate(current: DataFrame, deltas: DataFrame): DataFrame =
    current.join(deltas.select(col("id")), Seq("id"), "left_semi")

  /** Merge-upsert plan (K4; main.py:256-287 UPDATE…FROM): target rows take
    * the update's last_played/play_count/play_duration where ids match —
    * the reference updates exactly those 3 columns (main.py:276-279). */
  def mergeUpdates(target: DataFrame, updates: DataFrame): DataFrame = {
    val u = updates.select(col("id"),
      col("last_played_date_time").as("u_last_played"),
      col("play_count").as("u_play_count"),
      col("play_duration").as("u_play_duration"))
    target.join(u, Seq("id"), "left")
      .select(
        col("id"), col("title_id"), col("title_name"), col("image"),
        col("category"), col("first_played_date_time"),
        coalesce(col("u_last_played"), col("last_played_date_time"))
          .as("last_played_date_time"),
        coalesce(col("u_play_count"), col("play_count")).as("play_count"),
        coalesce(col("u_play_duration"), col("play_duration"))
          .as("play_duration"))
  }
}
