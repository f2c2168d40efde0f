package graft.psn

import java.sql.Timestamp

/** External-source boundary (SURVEY §2.1 S1/S2). The reference talks to the
  * PSN network via the PSNAWP HTTP client (main.py:315-320, 85-91); our
  * engine isolates that behind a trait so ingestion is testable and the
  * production impl can be a driver-side HTTP fetch (small data: one user's
  * library) — with a DataSource V2 reader as the scale path for fan-out
  * pagination (replacing the reference's asyncio experiment, test.py:1-27).
  */
trait PsnClient {
  /** S1: profile fetch → earnedTrophies tier counts (main.py:315-320). */
  def profileTrophies(): TrophySummary

  /** S2: per-title play stats iterator (main.py:85-91). */
  def titleStats(): Seq[GameTitleRaw]

  /** S2 metadata: total title count WITHOUT fetching any record — the
    * paged API's `totalItemCount` field, readable from a limit-0 page
    * request. This is the only call the DSv2 planner makes: partition
    * sizing at plan time must never trigger a driver-side record fetch
    * (planning would otherwise read the whole remote dataset once on the
    * driver and again on the executors). */
  def titleCount(): Int
}

/** Deterministic in-memory client for tests and local runs. */
final class FakePsnClient(
    trophies: TrophySummary,
    titles: Seq[GameTitleRaw]) extends PsnClient {
  override def profileTrophies(): TrophySummary = trophies
  override def titleStats(): Seq[GameTitleRaw] = titles
  override def titleCount(): Int = titles.size
}

object FakePsnClient {
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** A small deterministic library: 3 games, mixed categories. */
  def default: FakePsnClient = new FakePsnClient(
    TrophySummary(bronze = 120, silver = 45, gold = 12, platinum = 2),
    Seq(
      GameTitleRaw("CUSA_00001", "Alpha Quest", "http://img/1", "ps4_game",
        ts("2020-01-15 18:30:00"), ts("2024-05-01 21:00:00"), 42, "PT100H30M"),
      GameTitleRaw("CUSA_00002", "Beta Racer", "http://img/2", "ps5_native_game",
        ts("2021-06-02 10:00:00"), ts("2024-06-11 09:15:00"), 7, "PT12H5M30S"),
      GameTitleRaw("PPSA_10003", "Gamma Souls", "http://img/3", "ps5_native_game",
        ts("2023-11-20 22:45:00"), ts("2024-07-30 23:59:59"), 133, "PT340H")))
}
