package graft.psn

import java.sql.Timestamp

/** Typed domain model for the reference pipeline's tables (FIXTURES.md §A;
  * reference /root/reference/main.py). Schema-on-write: these case classes
  * are the StructType source of truth, replacing the reference's runtime
  * `client.get_table(...).schema` introspection (main.py:57-58).
  */

/** One per-title play-stats record as the PSN API yields it
  * (main.py:89-93: title_id, name, image_url, category, first/last played,
  * play_count, play_duration). play_duration arrives as an ISO-8601
  * duration string (PT…H…M…S) — normalized to seconds at ingestion (E8). */
final case class GameTitleRaw(
    title_id: String,
    name: String,
    image_url: String,
    category: String,
    first_played_date_time: Timestamp,
    last_played_date_time: Timestamp,
    play_count: Long,
    play_duration: String)

/** The cleaned game dimension row (main.py:93-116). */
final case class GameTitle(
    id: String,
    title_id: String,
    title_name: String,
    image: String,
    category: String,
    first_played_date_time: Timestamp,
    last_played_date_time: Timestamp,
    play_count: Long,
    play_duration: Double)

/** Trophy-tier counts from the profile's earnedTrophies map
  * (main.py:315-320). */
final case class TrophySummary(
    bronze: Long, silver: Long, gold: Long, platinum: Long)

/** Daily trophy snapshot row (main.py:323-327). */
final case class TrophySnapshot(
    bronze: Long, silver: Long, gold: Long, platinum: Long,
    date: java.sql.Date)

/** Play-time delta fact (main.py:197-203). */
final case class TimePlayDelta(
    id: String,
    play_count_diff: Long,
    play_duration_diff: Double,
    date: Timestamp)
