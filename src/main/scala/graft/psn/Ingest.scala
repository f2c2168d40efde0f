package graft.psn

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Ingestion stages (SURVEY §2.1 S1/S2 + §2.7 expression cleanup).
  * Driver-side fetch → `createDataFrame` → declarative column cleanup; all
  * per-row work is Catalyst expressions (no UDFs), so the same plan fragment
  * runs unchanged when the source becomes a DSv2 reader at scale.
  */
object Ingest {

  /** Trophy snapshot: map pivot → one wide row + execution-date stamp
    * (E11+E9; main.py:323-327). */
  def trophySnapshot(spark: SparkSession, client: PsnClient): DataFrame = {
    import spark.implicits._
    Seq(client.profileTrophies()).toDS().toDF()
      .withColumn("date", current_date())
  }

  /** Game dimension: the reference's cleanup chain (main.py:93-116):
    * category → last-3 slice (E2), title_id → strip underscores (E3),
    * casts (E4), surrogate key (E5+E6), ISO duration → seconds (E8). */
  def gameTitles(spark: SparkSession, client: PsnClient): DataFrame = {
    import spark.implicits._
    cleanGameTitles(client.titleStats().toDS().toDF())
  }

  /** The cleanup chain as a pure `DataFrame => DataFrame` — the same plan
    * fragment serves the driver-side `createDataFrame` path above and the
    * DSv2 streaming path (`Streams.psnGameSnapshots`). */
  def cleanGameTitles(raw: DataFrame): DataFrame =
    raw.select(
      Exprs.deriveId(col("title_id"), col("first_played_date_time"))
        .as("id"),
      Exprs.stripUnderscores(col("title_id")).as("title_id"),
      col("name").cast("string").as("title_name"),
      col("image_url").cast("string").as("image"),
      Exprs.lastChars(col("category"), 3).as("category"),
      col("first_played_date_time"),
      col("last_played_date_time"),
      col("play_count").cast("long").as("play_count"),
      Exprs.isoDurationSeconds(col("play_duration")).as("play_duration"))
}
