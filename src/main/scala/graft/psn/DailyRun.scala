package graft.psn

import org.apache.spark.sql.SparkSession

/** Orchestrators mirroring the reference's two entry points.
  *
  * [[Bootstrap]] = load_data_first.py (one-shot backfill; with the line-147
  * wrong-table bug fixed: the game table is written to the game table, not
  * the trophy table — documented in SURVEY §3.2).
  *
  * [[DailyRun]] = main.py:296-368, with the same control flow: ingest →
  * append trophy snapshot → anti-join new games → append → snapshot delta →
  * (if any deltas) append facts + semi-join + merge-upsert. The `len>0`
  * branch (main.py:350) stays an explicit driver decision — but computed
  * once (`deltas.isEmpty`-equivalent via a cached count) rather than
  * collecting data to the driver.
  */
object Bootstrap {
  def run(spark: SparkSession, client: PsnClient, store: TableStore): Unit = {
    store.overwrite("trophee", Ingest.trophySnapshot(spark, client))
    store.overwrite("game", Ingest.gameTitles(spark, client))
  }
}

object DailyRun {

  /** Returns (newGames, deltas) row counts for observability (the reference
    * prints them, main.py:187,236). */
  def run(spark: SparkSession, client: PsnClient,
      store: TableStore): (Long, Long) = {
    // 1-2. ingest + sink trophies (S1, K1)
    store.append("trophee", Ingest.trophySnapshot(spark, client))

    // 4. ingest games (S2 + expression cleanup)
    val current = Ingest.gameTitles(spark, client)
    current.cache() // reused by 3 downstream stages

    // 5. scan history with projection pushdown (S3: 6 of 9 columns)
    val stored = store.read("game")
      .select("id", "title_name", "first_played_date_time",
        "last_played_date_time", "play_count", "play_duration")

    // 6. dedup-insert new games (J2 + K1)
    val fresh = Ops.newGames(current, stored)
    val nNew = fresh.count()
    if (nNew > 0) store.append("game", fresh)

    // 7. play-time deltas (J1+E1+P3+P1+E9)
    val deltas = Ops.playTimeDeltas(stored, current)
    deltas.cache()
    val nDeltas = deltas.count()

    // 8. conditional branch (main.py:350): facts + upsert only when changed
    if (nDeltas > 0) {
      store.append("time_play", deltas)                   // K2
      val toUpdate = Ops.gamesNeedingUpdate(current, deltas) // J3
      store.merge("game", toUpdate)                       // K4
    }
    deltas.unpersist()
    current.unpersist()
    (nNew, nDeltas)
  }
}
