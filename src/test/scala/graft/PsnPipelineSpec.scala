package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.psn._

/** End-to-end test of the reference pipeline semantics (SURVEY §3.1/§3.2):
  * bootstrap → daily run with changes → idempotent re-run. Exercises S1/S2
  * ingestion, E2-E8 cleanup, J1-J3 joins, K1-K5 sinks and the main.py:350
  * conditional branch against a temp parquet warehouse. */
class PsnPipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val day1 = FakePsnClient.default

  /** Day 2: Beta Racer played 3 more times (+2h), one brand-new game. */
  private val day2 = new FakePsnClient(
    TrophySummary(121, 45, 12, 2),
    day1.titleStats().map {
      case g if g.title_id == "CUSA_00002" =>
        g.copy(play_count = 10, play_duration = "PT14H5M30S",
          last_played_date_time = ts("2024-08-01 12:00:00"))
      case g => g
    } :+ GameTitleRaw("CUSA_99999", "Delta Farm", "http://img/9", "ps4_game",
      ts("2024-07-15 09:00:00"), ts("2024-08-01 20:00:00"), 1, "PT2H"))

  test("bootstrap + daily run: new games, deltas, merge-upsert, idempotence") {
    val wh = Files.createTempDirectory("psn_wh").toString
    val store = new TableStore(spark, wh)

    Bootstrap.run(spark, day1, store)
    assert(store.read("game").count() == 3)
    assert(store.read("trophee").count() == 1)

    // surrogate key fidelity: last7 of stripped id ++ ddHHyyyyMM
    val id2 = store.read("game")
      .filter(col("title_id") === "CUSA00002").select("id")
      .head.getString(0)
    assert(id2 == "SA000020210202106")
    // ISO duration → seconds (E8)
    val dur2 = store.read("game")
      .filter(col("title_id") === "CUSA00002").select("play_duration")
      .head.getDouble(0)
    assert(dur2 == 12 * 3600 + 5 * 60 + 30.0)

    val (nNew, nDeltas) = DailyRun.run(spark, day2, store)
    assert(nNew == 1 && nDeltas == 1)

    val game = store.read("game")
    assert(game.count() == 4)
    // merge-upsert applied the 3 updated columns for the changed game only
    val updated = game.filter(col("title_id") === "CUSA00002").head
    assert(updated.getAs[Long]("play_count") == 10)
    assert(updated.getAs[Double]("play_duration") ==
      14 * 3600 + 5 * 60 + 30.0)
    assert(updated.getAs[Timestamp]("last_played_date_time") ==
      ts("2024-08-01 12:00:00"))
    val untouched = game.filter(col("title_id") === "CUSA00001").head
    assert(untouched.getAs[Long]("play_count") == 42)

    // delta fact: play_count_diff 3, play_duration_diff 7200s — read back
    // through the typed schema (TimePlayDelta is the table's contract)
    {
      import spark.implicits._
      val tp = store.read("time_play").as[TimePlayDelta].head()
      assert(tp.play_count_diff == 3)
      assert(tp.play_duration_diff == 7200.0)
      val ts = store.read("trophee").as[TrophySnapshot].collect()
      assert(ts.forall(_.bronze >= 120))
    }

    // idempotence: same inputs again → no new games, no deltas (P3 >0)
    val (n2, d2) = DailyRun.run(spark, day2, store)
    assert(n2 == 0 && d2 == 0)
    assert(store.read("game").count() == 4)
    assert(store.read("time_play").count() == 1)
    assert(store.read("trophee").count() == 3) // one snapshot per run
  }

  test("newGames ∪ (current ⋉ stored) partitions current (SURVEY §5d)") {
    val current = Ingest.gameTitles(spark, day2)
    val stored = Ingest.gameTitles(spark, day1)
    val fresh = Ops.newGames(current, stored)
    val known = current.join(stored.select("id"), Seq("id"), "left_semi")
    assert(fresh.count() + known.count() == current.count())
  }

  test("typed Dataset surface + PlayStats Aggregator") {
    val games = psn.Typed.gameTitles(spark, day1)
    val stats = psn.Typed.playStats(games)
    assert(stats.titles == 3)
    assert(stats.totalPlays == 42 + 7 + 133)
    assert(stats.maxPlays == 133)
    assert(stats.totalSeconds ==
      (100 * 3600 + 30 * 60) + (12 * 3600 + 5 * 60 + 30) + 340 * 3600.0)
  }

  test("trophy snapshot is one wide row with a date stamp (E11+E9)") {
    val t = Ingest.trophySnapshot(spark, day1)
    assert(t.columns.toSeq ==
      Seq("bronze", "silver", "gold", "platinum", "date"))
    assert(t.count() == 1)
    assert(t.head.getAs[Long]("bronze") == 120)
  }
}
