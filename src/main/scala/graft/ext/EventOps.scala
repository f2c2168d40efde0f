package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.expr.Exprs._
import graft.tables.Tables._
import graft.ops.Out._

/** Event-stream analytics over `events` — the batch twins of the streaming
  * surface (SURVEY §2.8). The same plans run under Structured Streaming
  * (see graft.streaming.Streams); here they are bounded so the DuckDB oracle
  * can gate them. Bucketing is integer epoch arithmetic (portable across
  * engines, unlike timezone-sensitive window helpers).
  */
object EventOps {

  /** `events.ts` reaches every consumer as a nanosecond **long** —
    * [[graft.tables.Tables.events]] normalizes whatever physical type the
    * corpus carries (TIMESTAMP(NANOS) under nanosAsLong originally;
    * micros TIMESTAMP_NTZ since the round-6 regeneration) to that one
    * contract. All time math therefore uses exact integer arithmetic on
    * epoch seconds — `ts div 1e9` here, `floor(epoch(ts))` in the oracle —
    * identical flooring on both engines and no double-precision loss on
    * 1.7e18 nanos. */
  private val tsSec = expr("ts div 1000000000")

  /** s01: 5-minute tumbling-window aggregation per event type. Streaming twin:
    * `groupBy(window($"ts", "5 minutes"), $"event_type")` + watermark. */
  def s01Tumbling(s: SparkSession, dir: String): DataFrame = {
    val sec = tsSec
    events(s, dir)
      .groupBy((sec - sec % 300).as("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        lsum(col("value")).as("sum_value"))
      .sortedWide("bucket_start", "event_type")
  }

  val s01Oracle: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |           FROM events)
       |SELECT sec - sec % 300 AS bucket_start, event_type,
       |COUNT(*) AS n_events, ${dsumSql("value")} AS sum_value
       |FROM e GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin

  /** s02: gap-based sessionization (30-min inactivity) via lag + running sum
    * — the declarative form of session_window / flatMapGroupsWithState.
    * One shuffle on user_id; windows sort within partition. */
  def s02Sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sessions = events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          tsSec - expr("prev_ts div 1000000000") > 1800,
          1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions.groupBy(col("user_id"))
      .agg(max(col("sess_id")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .sortedWide("user_id")
  }

  val s02Oracle: String =
    """WITH x AS (
      |  SELECT user_id, event_id, ts,
      |    lag(ts, 1) OVER (PARTITION BY user_id
      |                     ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |y AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN prev_ts IS NULL OR
      |      CAST(floor(epoch(ts)) AS BIGINT)
      |        - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM x),
      |z AS (
      |  SELECT user_id,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM y)
      |SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin

  /** s03: semi-structured extraction — JSON prop pulled out and aggregated
    * (the reference's nested-JSON pivot, E11/`main.py:319-323`, generalized). */
  def s03JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .sortedSmall("event_type")

  val s03Oracle: String =
    """SELECT event_type, COUNT(*) AS n,
      |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
      |  AS sum_k,
      |MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** s04: per-hour dominant event type — windowed aggregation + rank
    * (agg-then-window, the grouped-top-k idiom). */
  def s04HourlyTop(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = tsSec
    val counts = events(s, dir)
      .groupBy((sec - sec % 3600).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("hour_start"))
      .orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("hour_start", "event_type", "n")
      .sortedWide("hour_start")
  }

  val s04Oracle: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |c AS (SELECT sec - sec % 3600 AS hour_start, event_type,
      |        COUNT(*) AS n
      |      FROM e GROUP BY 1, 2),
      |r AS (SELECT hour_start, event_type, n,
      |        row_number() OVER (PARTITION BY hour_start
      |                           ORDER BY n DESC, event_type) AS rnk
      |      FROM c)
      |SELECT hour_start, event_type, n FROM r WHERE rnk = 1
      |ORDER BY hour_start""".stripMargin

  /** s05: as-of join composed from built-ins (SURVEY custom-operator
    * preference (a)): for each purchase, the same user's latest prior click
    * — one window pass over the interleaved event stream instead of a
    * range self-join. At 100 TB this is the attribution-join shape: one
    * shuffle on user_id, no pair explosion. */
  def s05AsOfAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .withColumn("click_sec",
        last(when(col("event_type") === "click", tsSec),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"),
        (tsSec - col("click_sec")).as("gap_sec"))
      .sortedWide("purchase_id")
  }

  val s05Oracle: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |x AS (
      |  SELECT event_id, user_id, event_type, sec,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END
      |               IGNORE NULLS) OVER w AS click_id,
      |    last_value(CASE WHEN event_type = 'click' THEN sec END
      |               IGNORE NULLS) OVER w AS click_sec
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT event_id AS purchase_id, user_id, click_id,
      |  sec - click_sec AS gap_sec
      |FROM x WHERE event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** s06: range join via time-bucketing — purchases within 10 minutes
    * after a click by the same user. Spark has no range-join optimization
    * (a naive theta-join degenerates to per-user cross products), so the
    * click side explodes into its two candidate 10-minute buckets and the
    * join becomes an EQUI-join on (user, bucket) + an exact residual
    * filter. At 100 TB this turns O(clicks×purchases) per user into
    * O(pairs within adjacent buckets). */
  def s06RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val window = 600L
    val ev = events(s, dir).withColumn("sec", tsSec)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("sec").as("c_sec"),
        explode(array(expr(s"sec div $window"),
          expr(s"sec div $window") + 1)).as("jb"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("sec").as("p_sec"), expr(s"sec div $window").as("jb"))
    clicks.join(purchases, Seq("user_id", "jb"))
      .filter(col("p_sec") > col("c_sec") &&
        col("p_sec") <= col("c_sec") + window)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("p_sec") - col("c_sec")).as("gap_sec"))
      .sortedWide("click_id", "purchase_id")
  }

  val s06Oracle: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events)
      |SELECT c.event_id AS click_id, p.event_id AS purchase_id,
      |  c.user_id, p.sec - c.sec AS gap_sec
      |FROM e c JOIN e p
      |  ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.sec > c.sec AND p.sec <= c.sec + 600
      |ORDER BY click_id, purchase_id""".stripMargin

  /** s07: sliding-window aggregation (10-minute windows, 5-minute slide) —
    * every event lands in exactly two windows, materialized as a map-side
    * explode over the two candidate window starts (how Spark's own
    * `window(ts, "10 minutes", "5 minutes")` plans it: an Expand node, no
    * extra shuffle beyond the aggregation's). Streaming twin:
    * `groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")`. */
  def s07Sliding(s: SparkSession, dir: String): DataFrame = {
    val sec = tsSec
    val w0 = sec - sec % 300
    events(s, dir)
      .select(col("event_type"), col("value"),
        explode(array(w0, w0 - 300)).as("window_start"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), lsum(col("value")).as("sum_value"))
      .sortedWide("window_start", "event_type")
  }

  val s07Oracle: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |           FROM events),
       |i AS (SELECT unnest(generate_series(0, 1)) AS i),
       |w AS (SELECT sec - sec % 300 - i * 300 AS window_start,
       |        event_type, value
       |      FROM e CROSS JOIN i)
       |SELECT window_start, event_type, COUNT(*) AS n_events,
       |  ${dsumSql("value")} AS sum_value
       |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** s08: ordered funnel — how many users progressed view → click →
    * purchase in strict time order. Each stage is a conditional min-ts
    * aggregation joined against the previous stage's first-hit time (the
    * standard funnel shape: S stages = S shuffles on user_id, never a
    * per-user event sort on the driver). */
  def s08Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).withColumn("sec", tsSec)
    def firstAfter(evType: String, prev: DataFrame, prevTs: String,
        outTs: String): DataFrame =
      e.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("sec") > col(prevTs))
        .groupBy(col("user_id")).agg(min(col("sec")).as(outTs))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("v_ts"))
    val c = firstAfter("click", v, "v_ts", "c_ts")
    val p = firstAfter("purchase", c, "c_ts", "p_ts")
    val mk = (stage: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"),
        col("n_users"))
    mk("1_view", v).union(mk("2_click", c)).union(mk("3_purchase", p))
      .sortedSmall("stage")
  }

  val s08Oracle: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |v AS (SELECT user_id, min(sec) AS v_ts FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(sec) AS c_ts
      |      FROM e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND sec > v_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(sec) AS p_ts
      |      FROM e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND sec > c_ts GROUP BY 1)
      |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      |UNION ALL
      |SELECT '2_click', COUNT(*) FROM c
      |UNION ALL
      |SELECT '3_purchase', COUNT(*) FROM p
      |ORDER BY stage""".stripMargin

  /** s09: cohort retention — users bucketed by first-activity week
    * (cohort), counted distinct per week-offset since their cohort. The
    * canonical engagement matrix every analytics stack computes. Two
    * shuffles on user_id (cohort min + distinct activity), one on the
    * bounded (cohort, offset) matrix; week arithmetic is integer epoch
    * math (portable — no calendar/timezone dependence). */
  def s09CohortRetention(s: SparkSession, dir: String): DataFrame = {
    // integer div end-to-end (`div`, not `/`): a double quotient near a
    // week boundary could round across it and disagree with DuckDB's `//`
    val weeks = events(s, dir)
      .select(col("user_id"),
        expr("(ts div 1000000000) div 604800").as("wk"))
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    weeks.distinct()
      .join(cohorts, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .sortedSmall("cohort_wk", "offset")
  }

  val s09Oracle: String =
    """WITH w AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
      |  FROM events),
      |c AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY 1)
      |SELECT cohort_wk, wk - cohort_wk AS offset,
      |  COUNT(DISTINCT w.user_id) AS n_users
      |FROM w JOIN c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** s10: inter-event gap (think-time) analysis — per-user gaps via lag,
    * rolled up per event count band: how long users idle between actions,
    * the base signal for session-timeout tuning and bot detection.
    * One shuffle on user_id for the lag window; the rollup reuses exact
    * integer seconds so both engines bucket identically. */
  def s10InterEventGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = tsSec
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), sec.as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull)
    // gap band: 0-59s, 1-9min, 10-59min, 1h+
    val band = when(col("gap") < 60, "a_under_1m")
      .when(col("gap") < 600, "b_1m_10m")
      .when(col("gap") < 3600, "c_10m_1h")
      .otherwise("d_over_1h")
    gaps.select(band.as("gap_band"), col("gap"), col("user_id"))
      .groupBy(col("gap_band"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("gap")).as("min_gap_s"),
        max(col("gap")).as("max_gap_s"),
        round(lavg(col("gap").cast("double"), 6), 3).as("avg_gap_s"))
      .sortedSmall("gap_band")
  }

  val s10Oracle: String =
    s"""WITH e AS (SELECT user_id, event_id, ts,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
       |g AS (SELECT user_id,
       |        sec - lag(sec) OVER (PARTITION BY user_id
       |                             ORDER BY ts, event_id) AS gap
       |      FROM e),
       |b AS (SELECT user_id, gap,
       |        CASE WHEN gap < 60 THEN 'a_under_1m'
       |             WHEN gap < 600 THEN 'b_1m_10m'
       |             WHEN gap < 3600 THEN 'c_10m_1h'
       |             ELSE 'd_over_1h' END AS gap_band
       |      FROM g WHERE gap IS NOT NULL)
       |SELECT gap_band, COUNT(*) AS n_gaps,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  MIN(gap) AS min_gap_s, MAX(gap) AS max_gap_s,
       |  round(${davgSql("gap", 6)}, 3) AS avg_gap_s
       |FROM b GROUP BY gap_band ORDER BY gap_band""".stripMargin

  /** s11: calendar gap-fill + forward-fill — the time-series resample of a
    * metrics pipeline. Per user, the sparse (day, n_events, day_value)
    * series densifies onto that user's full [first_day, last_day] calendar
    * (`sequence` + explode = generate_series), missing days get
    * n_events=0, and `carried_value` forward-fills the last observed
    * day_value (last-observation-carried-forward). Plan: one shuffle for
    * the daily rollup, a tiny per-user span aggregate whose exploded grid
    * left-joins the rollup on (user, day) — both sides already partitioned
    * by user after the rollup — and one user-partitioned window for the
    * fill. Grid size is users × their own span, never a global cross
    * join. */
  def s11GapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = expr("ts div 1000000000 div 86400")
    val daily = events(s, dir)
      .groupBy(col("user_id"), day.as("day"))
      .agg(count(lit(1)).as("n_events"), lsum(col("value")).as("day_value"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_value"))
      .withColumn("carried_value",
        last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("is_active", col("n_events") > 0)
      .sortedWide("user_id", "day")
  }

  val s11Oracle: String =
    s"""WITH e AS (SELECT user_id,
       |             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, value
       |           FROM events),
       |daily AS (SELECT user_id, day, COUNT(*) AS n_events,
       |            ${dsumSql("value")} AS day_value
       |          FROM e GROUP BY 1, 2),
       |grid AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day
       |         FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
       |               FROM daily GROUP BY user_id)),
       |j AS (SELECT g.user_id, g.day,
       |        coalesce(d.n_events, 0) AS n_events, d.day_value
       |      FROM grid g LEFT JOIN daily d
       |        ON d.user_id = g.user_id AND d.day = g.day)
       |SELECT user_id, day, n_events, day_value,
       |  last_value(day_value IGNORE NULLS) OVER (
       |    PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_value,
       |  n_events > 0 AS is_active
       |FROM j ORDER BY user_id, day""".stripMargin

  /** s12: windowed semantic event dedup — collapse repeated
    * (user, event_type) activity inside each 5-minute bucket to its first
    * occurrence (by ts, then event_id), reporting per-type totals, kept
    * counts, and the value sum of the keepers. This is the batch twin of
    * [[graft.streaming.Streams.dedupedEvents]] generalized from exact
    * event_id redelivery to a SEMANTIC key: the pattern that collapses
    * double-fired client telemetry before it skews downstream counts.
    * Streaming form: the same keep-first state under
    * `dropDuplicatesWithinWatermark(user_id, event_type, bucket)`.
    *
    * Plan: one shuffle on (user_id, event_type, bucket) for the
    * keep-first window, then a map-side-combinable rollup to event_type —
    * no join, no second pass over the event stream. */
  def s12EventDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = tsSec
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("bucket"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("bucket", sec - sec % 300)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        lsum(when(col("rn") === 1, col("value")).otherwise(lit(0.0)))
          .as("kept_value"))
      .withColumn("n_dupes", col("n_total") - col("n_kept"))
      .sortedSmall("event_type")
  }

  val s12Oracle: String =
    s"""WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
       |           FROM events),
       |b AS (SELECT *, sec - sec % 300 AS bucket FROM e),
       |r AS (SELECT event_type, value,
       |        row_number() OVER (
       |          PARTITION BY user_id, event_type, bucket
       |          ORDER BY ts, event_id) AS rn
       |      FROM b)
       |SELECT event_type, COUNT(*) AS n_total,
       |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  ${dsumSql("CASE WHEN rn = 1 THEN value ELSE 0 END")} AS kept_value,
       |  COUNT(*) - CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dupes
       |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  /** s13: event-rate anomaly flags — each (type, hour)'s count compared
    * against its own trailing 24-observed-hours baseline (ROWS frame, so
    * gap hours don't dilute the mean identically on both engines); a
    * spike is count > 2× trailing mean, tested in cross-multiplied
    * INTEGER arithmetic (n·trailing_n > 2·trailing_sum) so no division
    * enters the hash. The on-call "did this event type just surge"
    * probe; streaming twin is the same agg under a sliding watermark
    * window.
    *
    * Plan: one shuffle for the hourly rollup (map-side combinable), one
    * type-partitioned window over the TINY rollup (types × hours), final
    * bounded sort. */
  def s13RateAnomaly(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sec = tsSec
    val hourly = events(s, dir)
      .groupBy((sec - sec % 3600).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("trailing_sum",
        coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("trailing_n", count(col("n")).over(w))
      .filter(col("trailing_n") > 0)
      .select(col("hour_start"), col("event_type"), col("n"),
        col("trailing_sum"), col("trailing_n"),
        (col("n") * col("trailing_n") >
          col("trailing_sum") * 2).as("is_spike"))
      .sortedWide("event_type", "hour_start")
  }

  val s13Oracle: String =
    """WITH e AS (SELECT event_type,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |h AS (SELECT sec - sec % 3600 AS hour_start, event_type,
      |        COUNT(*) AS n
      |      FROM e GROUP BY 1, 2),
      |t AS (SELECT hour_start, event_type, n,
      |        coalesce(SUM(n) OVER (PARTITION BY event_type
      |          ORDER BY hour_start
      |          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING), 0)
      |          AS trailing_sum,
      |        COUNT(n) OVER (PARTITION BY event_type ORDER BY hour_start
      |          ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trailing_n
      |      FROM h)
      |SELECT hour_start, event_type, n,
      |  CAST(trailing_sum AS BIGINT) AS trailing_sum,
      |  CAST(trailing_n AS BIGINT) AS trailing_n,
      |  n * trailing_n > trailing_sum * 2 AS is_spike
      |FROM t WHERE trailing_n > 0
      |ORDER BY event_type, hour_start""".stripMargin

  /** s14: rolling active users — exact DAU and trailing-7-day WAU per
    * active day, the engagement staple every event pipeline reports.
    *
    * The scalable shape for rolling DISTINCT: no per-day user-set window
    * (unbounded state) and no day×day range join — each distinct
    * (day, user) pair EXPANDS to the ≤7 anchor days it keeps the user
    * active for (constant ×7 narrow explode), then one distinct + one
    * count per anchor. Every stage is an equi-shuffle on (day, user) or
    * day; the anchor-day dimension is broadcast. At 100 TB: shuffles
    * carry distinct pairs (bounded by users×days, already deduped
    * map-side), never raw events. */
  def s14RollingActive(s: SparkSession, dir: String): DataFrame = {
    val day = expr("(ts div 1000000000) div 86400")
    val du = events(s, dir)
      .select(day.as("day"), col("user_id")).distinct()
    val anchors = du.select(col("day")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"),
        col("user_id"))
      .join(broadcast(anchors), "day", "left_semi")
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select((col("day") * 86400L).as("day_start"),
        col("dau"), col("wau"))
      .sortedWide("day_start")
  }

  val s14Oracle: String =
    """WITH e AS (SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400)
      |             AS day, user_id FROM events),
      |du AS (SELECT DISTINCT day, user_id FROM e),
      |anchors AS (SELECT DISTINCT day FROM du),
      |dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day),
      |ex AS (SELECT DISTINCT a.day AS day, du.user_id
      |       FROM du JOIN anchors a ON a.day BETWEEN du.day AND du.day + 6),
      |wau AS (SELECT day, COUNT(*) AS wau FROM ex GROUP BY day)
      |SELECT CAST(d.day * 86400 AS BIGINT) AS day_start,
      |  CAST(d.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau
      |FROM dau d JOIN wau w USING (day) ORDER BY day_start""".stripMargin

  /** s15: behavioral sequence mining — the top event-type trigrams across
    * user timelines (the sequence-pattern flavor of market-basket
    * analysis: which 3-step paths dominate, and how many distinct users
    * walk them). Each user's events order by (ts, event_id); consecutive
    * type triples count occurrences and distinct-user support, and the
    * report is the top 20 patterns by frequency (deterministic
    * lexicographic tiebreak).
    *
    * Plan shape: ONE user-keyed exchange feeds both lead() windows (same
    * partition/order spec → one sort), the pattern rollup is a hash
    * aggregate over a key domain bounded by |event_type|³ (125 here —
    * constant in corpus size, so the aggregate is map-side-combined into
    * a bounded table), and the top-20 sorts that bounded table. At
    * 100 TB the only corpus-sized stages are the scan and the per-user
    * sort — the s02 sessionize budget exactly. */
  def s15BehaviorNgrams(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"))
      .filter(col("t3").isNotNull)
      .groupBy(col("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n_walks"),
        countDistinct(col("user_id")).as("n_users"))
      .sortedSmall(col("n_walks").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  val s15Oracle: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS t1,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |pat AS (
      |  SELECT t1, t2, t3, COUNT(*) AS n_walks,
      |    COUNT(DISTINCT user_id) AS n_users
      |  FROM seq WHERE t3 IS NOT NULL
      |  GROUP BY t1, t2, t3)
      |SELECT t1, t2, t3, n_walks, n_users FROM pat
      |ORDER BY n_walks DESC, t1, t2, t3 LIMIT 20""".stripMargin

  /** s16: multi-touch LINEAR attribution — every purchase's credit splits
    * equally across all of the same user's click/view touches in the hour
    * before it, and the report rolls the fractional credit up per touch
    * type (the marketing-attribution model family's third member: s05
    * covers last-touch, first-touch is its mirror; linear is the one that
    * needs the full touch set per conversion, not just an as-of pick).
    * Credit is integer ppm (1e6 div n_touches) and value credit integer
    * cents, so both engines split bit-identically.
    *
    * Plan shape: the s06 bucketed range join (touches explode into two
    * 1-hour buckets, the join is EQUI on (user, bucket) + exact residual
    * — never a per-user cross product), then ONE purchase-keyed window
    * counts each conversion's touch set (no self-join back), and the
    * rollup is a 2-row hash aggregate. At 100 TB every stage is keyed on
    * user/purchase ids; the bucket trick keeps candidate volume
    * proportional to true matches, the s06 budget exactly. */
  def s16LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val win = 3600L
    val ev = events(s, dir).withColumn("sec", tsSec)
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("sec").as("t_sec"),
        explode(array(expr(s"sec div $win"),
          expr(s"sec div $win") + 1)).as("jb"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("sec").as("p_sec"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_cents"),
        expr(s"sec div $win").as("jb"))
    val perConv = Window.partitionBy(col("purchase_id"))
    touches.join(purchases, Seq("user_id", "jb"))
      .filter(col("t_sec") < col("p_sec") &&
        col("p_sec") <= col("t_sec") + win)
      .withColumn("pn", count(lit(1)).over(perConv))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_conversions"),
        sum(expr("1000000 div pn")).as("credit_ppm"),
        sum(expr("value_cents div pn")).as("credit_cents"))
      .sortedSmall("touch_type")
  }

  val s16Oracle: String =
    """WITH e AS (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |           FROM events),
      |t AS (SELECT user_id, event_type AS touch_type, sec AS t_sec
      |      FROM e WHERE event_type IN ('click', 'view')),
      |p AS (SELECT user_id, event_id AS purchase_id, sec AS p_sec,
      |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
      |      FROM e WHERE event_type = 'purchase'),
      |a AS (SELECT t.touch_type, p.purchase_id, p.value_cents,
      |        COUNT(*) OVER (PARTITION BY p.purchase_id) AS pn
      |      FROM t JOIN p ON t.user_id = p.user_id
      |        AND t.t_sec < p.p_sec AND p.p_sec <= t.t_sec + 3600)
      |SELECT touch_type, COUNT(*) AS n_touches,
      |  COUNT(DISTINCT purchase_id) AS n_conversions,
      |  CAST(SUM(1000000 // pn) AS BIGINT) AS credit_ppm,
      |  CAST(SUM(value_cents // pn) AS BIGINT) AS credit_cents
      |FROM a GROUP BY touch_type ORDER BY touch_type""".stripMargin

  /** s17: Markov-chain stationary distribution of the event-type process
    * — the transition matrix from each user's consecutive event pairs,
    * power-iterated 8 rounds from uniform in integer ppm arithmetic, next
    * to the empirically observed type share. The drift column (stationary
    * − observed) is the behavioral-model health check: a chain whose
    * long-run mix diverges from the observed mix flags non-stationary
    * traffic (bot bursts, instrumentation drift).
    *
    * Plan shape: the corpus-sized work is ONE user-keyed window (the s15
    * sort, reused) plus a |types|² hash aggregate — the transition matrix
    * is then a bounded model artifact (25 cells here; at any corpus it is
    * |event_type|², constant in row count), collected under the codebook
    * discipline and iterated on the driver in exact integer math: p(s,t)
    * = 1e6·c(s,t) div c(s,·); pi' (t) = Σ_s pi(s)·p(s,t) div 1e6. Mass
    * lost to states without outgoing transitions stays lost on both
    * engines (documented contract; every type here has out-edges). At
    * 100 TB the scan dominates; the iteration cost is K²·rounds driver
    * flops — the same place a production pipeline computes it. */
  def s17MarkovStationary(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events(s, dir)
      .select(col("user_id"), col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"))
      .filter(col("t2").isNotNull)
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n"))
      .collect() // bounded: |event_type|^2 cells, the codebook discipline
    val obs = events(s, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    val states = obs.select(col("event_type")).collect()
      .map(_.getString(0)).sorted // bounded: |event_type| rows
    val k = states.length
    val idx = states.zipWithIndex.toMap
    val c = Array.ofDim[Long](k, k)
    trans.foreach(r => c(idx(r.getString(0)))(idx(r.getString(1))) = r.getLong(2))
    val rowTot = c.map(_.sum)
    val p = Array.tabulate(k, k)((i, j) =>
      if (rowTot(i) == 0L) 0L else 1000000L * c(i)(j) / rowTot(i))
    var pi = Array.fill(k)(1000000L / k)
    (1 to MarkovRounds).foreach { _ =>
      pi = Array.tabulate(k)(j =>
        (0 until k).map(i => pi(i) * p(i)(j)).sum / 1000000L)
    }
    import s.implicits._
    val piDf = states.zip(pi).toSeq.toDF("event_type", "stationary_ppm")
    val wAll = Window.partitionBy() // 5-row input: single partition is fine
    obs
      .withColumn("tot", sum(col("n_events")).over(wAll))
      .withColumn("observed_ppm", expr("1000000 * n_events div tot"))
      .join(broadcast(piDf), "event_type")
      .select(col("event_type"), col("n_events"), col("observed_ppm"),
        col("stationary_ppm"),
        (col("stationary_ppm") - col("observed_ppm")).as("drift_ppm"))
      .sortedSmall("event_type")
  }

  private val MarkovRounds = 8

  /** Replays the 8 unrolled power-iteration rounds in the same integer
    * arithmetic (floor once per target state per round, after the sum). */
  val s17Oracle: String = {
    val rounds = (1 to MarkovRounds).map { r =>
      s"""pi$r AS (
         |  SELECT st.state,
         |    coalesce((SELECT SUM(pi.ppm * m.p) // 1000000
         |              FROM pi${r - 1} pi JOIN m ON pi.state = m.t1
         |              WHERE m.t2 = st.state), 0) AS ppm
         |  FROM st)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type AS t1,
       |    lead(event_type, 1) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS t2
       |  FROM events),
       |c AS (SELECT t1, t2, COUNT(*) AS n FROM seq
       |      WHERE t2 IS NOT NULL GROUP BY t1, t2),
       |st AS (SELECT DISTINCT event_type AS state FROM events),
       |ns AS (SELECT COUNT(*) AS k FROM st),
       |m AS (SELECT t1, t2,
       |        (1000000 * n) // (SUM(n) OVER (PARTITION BY t1)) AS p
       |      FROM c),
       |pi0 AS (SELECT state, 1000000 // ns.k AS ppm FROM st, ns),
       |$rounds,
       |obs AS (SELECT event_type, COUNT(*) AS n_events FROM events
       |        GROUP BY event_type),
       |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS t FROM obs)
       |SELECT obs.event_type, obs.n_events,
       |  (1000000 * obs.n_events) // tot.t AS observed_ppm,
       |  CAST(pi$MarkovRounds.ppm AS BIGINT) AS stationary_ppm,
       |  CAST(pi$MarkovRounds.ppm AS BIGINT)
       |    - (1000000 * obs.n_events) // tot.t AS drift_ppm
       |FROM obs
       |JOIN pi$MarkovRounds ON obs.event_type = pi$MarkovRounds.state
       |CROSS JOIN tot
       |ORDER BY obs.event_type""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("s01_tumbling_window", s01Tumbling, Some(s01Oracle)),
    Q("s02_sessionize", s02Sessionize, Some(s02Oracle)),
    Q("s03_json_extract", s03JsonExtract, Some(s03Oracle)),
    Q("s04_hourly_top", s04HourlyTop, Some(s04Oracle)),
    Q("s05_asof_attribution", s05AsOfAttribution, Some(s05Oracle)),
    Q("s06_range_join", s06RangeJoin, Some(s06Oracle)),
    Q("s07_sliding_window", s07Sliding, Some(s07Oracle)),
    Q("s08_funnel", s08Funnel, Some(s08Oracle)),
    Q("s09_cohort_retention", s09CohortRetention, Some(s09Oracle)),
    Q("s10_inter_event_gaps", s10InterEventGaps, Some(s10Oracle)),
    Q("s11_gap_fill", s11GapFill, Some(s11Oracle)),
    Q("s12_event_dedup", s12EventDedup, Some(s12Oracle)),
    Q("s13_rate_anomaly", s13RateAnomaly, Some(s13Oracle)),
    Q("s14_rolling_active", s14RollingActive, Some(s14Oracle)),
    Q("s15_behavior_ngrams", s15BehaviorNgrams, Some(s15Oracle)),
    Q("s16_linear_attribution", s16LinearAttribution, Some(s16Oracle)),
    Q("s17_markov_stationary", s17MarkovStationary, Some(s17Oracle)))
}
