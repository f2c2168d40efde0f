package graft.psn

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` surface over the pipeline domain — compile-time field
  * checking where the schema is static (SURVEY §1.1: "typed stages as
  * `Dataset[T]` with case classes"). DataFrames remain the interchange for
  * dynamic-schema stages; these are the typed entry points.
  */
object Typed {

  /** The cleaned game dimension as a typed Dataset. */
  def gameTitles(spark: SparkSession, client: PsnClient): Dataset[GameTitle] = {
    import spark.implicits._
    Ingest.gameTitles(spark, client).as[GameTitle]
  }

  /** Library-level play statistics. */
  final case class PlayStats(
      titles: Long, totalPlays: Long, totalSeconds: Double, maxPlays: Long)

  /** Typed Aggregator (SURVEY §7.3 "custom typed aggregate") — merges
    * partials associatively, so Spark runs it map-side partial + reduce-side
    * final like any built-in aggregate. */
  object PlayStatsAgg extends Aggregator[GameTitle, PlayStats, PlayStats] {
    override def zero: PlayStats = PlayStats(0L, 0L, 0.0, 0L)
    override def reduce(b: PlayStats, g: GameTitle): PlayStats =
      PlayStats(b.titles + 1, b.totalPlays + g.play_count,
        b.totalSeconds + g.play_duration,
        math.max(b.maxPlays, g.play_count))
    override def merge(a: PlayStats, b: PlayStats): PlayStats =
      PlayStats(a.titles + b.titles, a.totalPlays + b.totalPlays,
        a.totalSeconds + b.totalSeconds, math.max(a.maxPlays, b.maxPlays))
    override def finish(r: PlayStats): PlayStats = r
    override def bufferEncoder: Encoder[PlayStats] = Encoders.product
    override def outputEncoder: Encoder[PlayStats] = Encoders.product
  }

  def playStats(games: Dataset[GameTitle]): PlayStats =
    games.select(PlayStatsAgg.toColumn).head()
}
