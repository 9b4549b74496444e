package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series queries over the `events` table: tumbling-window aggregation
  * and gap-based sessionization — the batch shapes whose streaming twins
  * live in graft.streaming. */
object Events {

  /** ev1: 5-minute tumbling-window aggregate per event type. Epoch-aligned
    * buckets match DuckDB's time_bucket. Partial aggregation runs map-side;
    * the shuffle key (window × type) is low-cardinality. */
  def ev1WindowAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Relational.microUnits(sum(col("value").cast("decimal(18,6)"))).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))
  }

  val ev1Sql: String =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type,
      |  count(*) AS n,
      |  CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin

  /** ev2: gap-based sessionization — a new session starts when a user is
    * idle > 30 minutes. One shuffle on user_id; lag + running sum are
    * computed inside the per-user window. */
  def ev2Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  val ev2Sql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked
      |)
      |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ev3: as-of join — for each purchase, the user's latest click at or
    * before the purchase time. Spark has no native as-of join; composing it
    * as a tagged union + ONE per-user window keeps it a single shuffle on
    * user_id (the join-then-filter formulation shuffles both sides and
    * explodes on active users). Clicks sort before purchases at equal ts so
    * `click_ts <= purchase_ts` matches DuckDB ASOF semantics. */
  def ev3AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_click"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_click"))
    // total order: event_id breaks (ts, kind) ties so the matched click is
    // deterministic even if a user ever has two clicks at one timestamp
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_click").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click", last(
        when(col("is_click") === 1,
          struct(col("ts").as("cts"), col("event_id").as("cid"))),
        ignoreNulls = true).over(w))
      .filter(col("is_click") === 0)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("last_click.cts").as("click_ts"),
        col("last_click.cid").as("click_id"))
      .orderBy(col("purchase_id"))
  }

  // NOT the ASOF JOIN form: ASOF only pins the greatest c.ts <= p.ts and
  // picks an ARBITRARY row among equal-ts clicks, while the Spark side
  // deterministically takes the larger event_id — the lateral top-1 makes
  // the oracle's tie-break explicit so the hash compare can never flap
  val ev3Sql: String =
    """WITH c AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |     p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |       c2.ts AS click_ts, c2.event_id AS click_id
      |FROM p LEFT JOIN LATERAL (
      |  SELECT ts, event_id FROM c
      |  WHERE c.user_id = p.user_id AND c.ts <= p.ts
      |  ORDER BY ts DESC, event_id DESC LIMIT 1
      |) c2 ON TRUE
      |ORDER BY purchase_id""".stripMargin

  /** ev4: range (interval-overlap) join — count events per derived time
    * window. A pure inequality join compiles to a broadcast nested loop
    * (O(events × windows)); instead both sides are bucketed into fixed
    * granules (granule = min window width): windows explode to the granules
    * they overlap, events carry their single granule, the join is an
    * EQUI-join on the granule id, and the exact bound check is a residual
    * filter. At 100 TB the granule key shuffles/co-locates like any
    * equi-join — pinned by a plan audit (no BroadcastNestedLoopJoin). */
  def ev4RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, dir).select(col("ts").cast("long").as("tss"))
    val bounds = e.agg(min(col("tss")), max(col("tss"))).head
    // empty events table: min/max are NULL — zero windows, zero rows (the
    // typed Row(t0: Long, ...) extractor used to die with a MatchError)
    if (bounds.isNullAt(0))
      return Seq.empty[(Long, Long)].toDF("window_id", "n")
    val t0 = bounds.getLong(0); val t1 = bounds.getLong(1)
    val span = t1 - t0
    val g = math.max(span / 40, 1L) // granule = min window width
    // 20 derived windows [ws, we) — integer-second arithmetic, exact in SQL
    val windows = (0L until 20L).flatMap { k =>
      val ws = t0 + k * span / 20
      val we = ws + span / 40
      if (we > ws) ((ws - t0) / g to (we - 1 - t0) / g).map(gr => (k, ws, we, gr))
      else Seq.empty
    }
    val w = windows.toDF("window_id", "ws", "we", "granule")
    e.withColumn("granule", (col("tss") - t0) / g cast "long")
      .join(w, Seq("granule"))
      .filter(col("tss") >= col("ws") && col("tss") < col("we"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_id"))
  }

  val ev4Sql: String =
    """WITH b AS (SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
      |                  CAST(floor(epoch(max(ts))) AS BIGINT) AS t1 FROM events),
      |     w AS (SELECT r.range AS window_id,
      |                  t0 + (r.range * (t1 - t0)) // 20 AS ws,
      |                  t0 + (r.range * (t1 - t0)) // 20 + (t1 - t0) // 40 AS we
      |           FROM b, range(20) r)
      |SELECT w.window_id, count(*) AS n
      |FROM w JOIN events e
      |  ON CAST(floor(epoch(e.ts)) AS BIGINT) >= w.ws
      | AND CAST(floor(epoch(e.ts)) AS BIGINT) < w.we
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ev5: NATIVE session windows — Spark's `session_window` grouping
    * operator (SessionWindowing + merging session aggregation in one
    * shuffle), vs ev2's lag/cumsum window-function formulation of the same
    * concept. Boundary semantics (verified empirically on this Spark):
    * session_window MERGES an event exactly gap-length after the previous
    * one — the per-event window is the closed-open [ts, ts+gap), and
    * merging triggers on touch, not just overlap — so the oracle breaks
    * sessions only on a STRICTLY greater gap (`>` in microseconds).
    * Output: one row per (user, session) with start, end (= last event +
    * gap) and event count. */
  def ev5SessionWindow(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))
      .orderBy(col("user_id"), col("s_start"))
  }

  val ev5Sql: String =
    """WITH m AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      |), s AS (
      |  SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM m
      |)
      |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 30 MINUTE AS s_end,
      |       count(*) AS n_events
      |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin

  /** ev6: time-grid resample + forward fill — align each event type to a
    * dense 5-minute grid from its first to its last observed bucket, then
    * gap-fill the metric with the last observed value (the
    * downsample-then-ffill pass a monitoring/feature pipeline runs before
    * joining time series). The metric forward-fills as exact BIGINT
    * micro-units, so the fill is hash-identical cross-engine (an avg-based
    * variant would ffill a double — engine-dependent in the last ulp).
    *
    * Shape: one low-cardinality (type × bucket) shuffle for the aggregate;
    * the grid generates from a per-type min/max aggregate (no driver
    * collect) and explodes ~span/5min rows per type; the fill is ONE
    * per-type ordered window. Grid size is O(types × span/step) —
    * independent of event volume, so 100 TB of events still resamples to
    * the same small grid; a deployment with very many types would also
    * range-partition the window key by (type, coarse time) to bound any
    * one partition. */
  def ev6Resample(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        Relational.microUnits(sum(col("value").cast("decimal(18,6)"))).as("sum_value"))
      .select(col("event_type"), col("w.start").as("ws"), col("n"), col("sum_value"))
    val grid = agg.groupBy(col("event_type"))
      .agg(min(col("ws")).as("ws0"), max(col("ws")).as("ws1"))
      .select(col("event_type"),
        explode(sequence(col("ws0"), col("ws1"), expr("interval 5 minutes"))).as("ws"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ws"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "ws"), "left")
      .select(col("event_type"), col("ws"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("n").isNotNull.cast("int").as("observed"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("sum_value_ffill"))
      .orderBy(col("event_type"), col("ws"))
  }

  val ev6Sql: String =
    """WITH agg AS (
      |  SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS ws,
      |    count(*) AS n,
      |    CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, min(ws) AS ws0, max(ws) AS ws1 FROM agg GROUP BY 1),
      |grid AS (SELECT event_type, unnest(generate_series(ws0, ws1, INTERVAL 5 MINUTE)) AS ws
      |         FROM bounds)
      |SELECT grid.event_type AS event_type, grid.ws AS ws,
      |  CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
      |  CAST(agg.n IS NOT NULL AS INTEGER) AS observed,
      |  last_value(agg.sum_value IGNORE NULLS) OVER (
      |    PARTITION BY grid.event_type ORDER BY grid.ws
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_ffill
      |FROM grid LEFT JOIN agg ON grid.event_type = agg.event_type AND grid.ws = agg.ws
      |ORDER BY 1, 2""".stripMargin

  /** ev7: rolling z-score anomaly detection — per user, each event's value
    * is scored against the mean/variance of its previous ≤ 20 events, and
    * flagged when |z| > 3; output is the per-user event/scored/anomaly
    * counts. The entire test runs in EXACT integer arithmetic so the flag
    * is bit-identical cross-engine: values become micro-unit integers
    * (the `microUnits` convention), and |z| > 3 with the population
    * variance of the n preceding values σ² = (n·Σv² − (Σv)²)/n² rewrites to
    *
    *   (v·n − Σv)² > 9·(n·Σv² − (Σv)²)
    *
    * — integer-only, no division, no sqrt, no float. Intermediates reach
    * ~10²³ so both engines compute in 128-bit (Spark decimal(38,0), DuckDB
    * HUGEINT), exact far beyond this range. Events with fewer than 10
    * predecessors in the window are not scored (n_scored counts the rest).
    *
    * Supported value range: |value| ≤ 10¹¹ (|v| ≤ 10¹⁷ micro-units). With
    * n ≤ 20, dev² ≤ (40·max|v|)² and 9·(n·q − sm²) ≤ 3600·max|v|², both
    * < 10³⁸ under the bound — the decimal(38,0) never overflows. Non-ANSI
    * Spark would turn an overflow into NULL (silently un-flagging an
    * extreme spike) while DuckDB's HUGEINT raises, so the guard below
    * `raise_error`s on out-of-range input instead of diverging.
    *
    * Shape: ONE shuffle on user_id — the three rolling stats are frames of
    * the same window spec (single Window operator), and the final per-user
    * groupBy rides the window's partitioning with no second exchange. At
    * 100 TB this is the standard time-series scan: state per task is the
    * 20-row frame, nothing corpus-sized. */
  def ev7Anomaly(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = byUser.rowsBetween(-20, -1)
    val dec = "decimal(38,0)"
    val vMicro = valueMicroDec.cast(dec)
    val e = Tables.events(s, dir)
      .withColumn("v", when(abs(vMicro) > lit(100000000000000000L),
        expr("raise_error('ev7: |value| exceeds 1e11 — z-score intermediates " +
          "would overflow decimal(38,0)')").cast(dec)).otherwise(vMicro))
      .withColumn("n", count(col("v")).over(frame))
      .withColumn("sm", sum(col("v")).over(frame))
      .withColumn("q", sum((col("v") * col("v")).cast(dec)).over(frame))
    val dev = (col("v") * col("n") - col("sm")).cast(dec)
    val anomaly = col("n") >= 10 &&
      (dev * dev).cast(dec) >
        (lit(9) * (col("n") * col("q") - (col("sm") * col("sm")).cast(dec))).cast(dec)
    e.withColumn("scored", when(col("n") >= 10, 1L).otherwise(0L))
      .withColumn("anom", when(anomaly, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("scored")).as("n_scored"),
        sum(col("anom")).as("n_anomalies"))
      .orderBy(col("user_id"))
  }

  val ev7Sql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS v
      |  FROM events),
      |w AS (
      |  SELECT user_id, v,
      |    count(v) OVER fr AS n,
      |    sum(v) OVER fr AS sm,
      |    sum(v*v) OVER fr AS q
      |  FROM e
      |  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
      |                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
      |  CAST(sum(CASE WHEN n >= 10
      |         AND (v*n - sm)*(v*n - sm) > 9*(n*q - sm*sm) THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_anomalies
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin

  /** ev8: ordered funnel analysis (view → click → purchase) — per user, the
    * deepest STRICTLY-ORDERED stage reached: a click counts only after the
    * first view, a purchase only after the first qualifying click (the
    * windowFunnel semantics analytics engines ship natively). Output:
    * (user_id, funnel_stage 0-3, the three stage timestamps).
    *
    * Shape: ONE events scan and ONE user_id shuffle — the three stage
    * timestamps are sequential whole-partition window aggregates over the
    * SAME partitioning (stage k's condition references stage k−1's column,
    * so they chain as three Window operators with no re-exchange), and the
    * per-user rollup rides the same partitioning too. The three-scan
    * join-per-stage formulation would read 100 TB of events three times;
    * this reads it once. Timestamps compare as exact integers (micros) —
    * no float anywhere. */
  def ev8Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("ts_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("ts_click",
        min(when(col("event_type") === "click" && col("ts") > col("ts_view"),
          col("ts"))).over(w))
      .withColumn("ts_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("ts_click"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("ts_view")).as("ts_view"), max(col("ts_click")).as("ts_click"),
        max(col("ts_purchase")).as("ts_purchase"))
      .select(col("user_id"),
        when(col("ts_purchase").isNotNull, 3)
          .when(col("ts_click").isNotNull, 2)
          .when(col("ts_view").isNotNull, 1)
          .otherwise(0).as("funnel_stage"),
        col("ts_view"), col("ts_click"), col("ts_purchase"))
      .orderBy(col("user_id"))
  }

  val ev8Sql: String =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id, min(ts) AS ts_view FROM events
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS ts_click
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.ts_view GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS ts_purchase
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.ts_click GROUP BY 1)
      |SELECT u.user_id,
      |  CASE WHEN p.user_id IS NOT NULL THEN 3
      |       WHEN c.user_id IS NOT NULL THEN 2
      |       WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
      |  v.ts_view, c.ts_click, p.ts_purchase
      |FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
      |       LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** ev9: rolling 1-hour activity count — for every event, how many events
    * the same user produced in the trailing hour (inclusive), via a
    * VALUE-based RANGE window frame rather than a row-count frame: the
    * frame is defined by the ordering value (exact integer MICROSECONDS on
    * both engines, so the boundary is bit-identical — an epoch-seconds cast
    * would floor Spark's bound while DuckDB's INTERVAL arithmetic stays at
    * micros), and tied timestamps are frame peers, making the count
    * independent of tie order. One shuffle on user_id; per-task state is
    * the sliding frame. */
  def ev9RollingCount(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, dir)
      .withColumn("tus", unix_micros(col("ts")))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("ts"), col("n_last_hour"))
      .orderBy(col("event_id"))
  }

  val ev9Sql: String =
    """SELECT event_id, user_id, ts,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
      |FROM events ORDER BY event_id""".stripMargin

  /** ev10: cohort retention — users are grouped into daily cohorts by their
    * first-ever activity day, and each later active day counts toward the
    * cohort's retention at that day offset; output is the classic
    * (cohort, day_offset, n_users) retention triangle.
    *
    * Shape: the cohort day is a whole-partition window min over ONE user_id
    * shuffle (no join back to a first-day table — at 100 TB that
    * formulation reads events twice and shuffles both join sides); the
    * (user, cohort, offset) de-dup and the triangle rollup then share the
    * second shuffle's key prefix. All arithmetic is calendar-day integer
    * math — no floats, no timezones (dates derive from UTC timestamps on
    * both engines). */
  def ev10Retention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort", min(col("day")).over(w))
      .withColumn("day_offset", datediff(col("day"), col("cohort")).cast("long"))
      .select(col("cohort"), col("day_offset"), col("user_id"))
      .distinct()
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      // DATE surfaces as a python object while DuckDB's DATE canonicalizes
      // to datetime64 — emit midnight timestamps so the dtype kinds agree
      .select(col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"), col("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  val ev10Sql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
      |           FROM events GROUP BY 1),
      |d AS (SELECT DISTINCT f.cohort,
      |        CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS BIGINT)
      |          AS day_offset,
      |        e.user_id
      |      FROM events e JOIN f USING (user_id))
      |SELECT CAST(cohort AS TIMESTAMP) AS cohort, day_offset, count(*) AS n_users
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** ev11: event-type transition matrix — for each ordered pair of event
    * types, how often a user's event of type A is IMMEDIATELY followed by
    * one of type B, and the conditional transition probability P(B|A) (the
    * first-order Markov chain product analytics tools fit over
    * clickstreams). Probabilities are exact integer micro-units
    * (n·10⁶ div n_from), so the matrix hash-matches cross-engine.
    *
    * Shape: successor types come from ONE lead() over the per-user
    * time-ordered window (one user_id shuffle — the self-join-on-next-event
    * formulation shuffles the events table twice and needs an
    * every-event-pair inequality condition); the (from,to) count then
    * partial-aggregates map-side into a type²-cardinality shuffle, and the
    * row-normalizing window re-keys on from_type alone. Ties at equal
    * timestamps order by event_id — a total order, so the matrix is
    * deterministic. */
  def ev11Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("n * 1000000 div n_from").as("p_micro"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val ev11Sql: String =
    """WITH t AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      |      FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |s AS (SELECT from_type, to_type, n,
      |        CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from
      |      FROM c)
      |SELECT from_type, to_type, n, n_from, (n * 1000000) // n_from AS p_micro
      |FROM s ORDER BY from_type, to_type""".stripMargin

  /** Zero-padded `(ts_micros ‖ event_id)` total-order key for the OHLC
    * open/close picks. Both Spark's and DuckDB's `lpad` silently TRUNCATE
    * inputs wider than the pad, and a '-' sign breaks zero-pad ordering —
    * either would collapse distinct keys and tie-break open/close
    * arbitrarily (potentially diverging between engines). The widths are
    * therefore guarded PER ROW: an event_id outside [0, 1e10) or a
    * pre-epoch timestamp raises instead of silently mis-ordering. A NULL
    * event_id or ts passes through as a NULL key — `min_by`/`max_by` (and
    * DuckDB's `arg_min`/`arg_max`) ignore NULL ordering keys, so such rows
    * keep their historical "never picked" behavior instead of tripping the
    * width guard's error. */
  def ohlcOrdKey: Column = {
    val anyNull = col("event_id").isNull || col("ts").isNull
    val widthOk = col("event_id").between(0L, 9999999999L) &&
      unix_micros(col("ts")) >= 0L
    when(anyNull, lit(null).cast("string"))
      .when(widthOk, concat(
        lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
        lpad(col("event_id").cast("string"), 10, "0")))
      .otherwise(raise_error(lit("OHLC order key assumes 0 <= event_id < 1e10" +
        " and ts >= epoch (NULLs pass through); widen the pads for this data"))
        .cast("string"))
  }

  /** The decimal micro-unit product every `value` consumer builds on — ONE
    * definition of the HALF_UP scale-6 rounding convention, so ev7's
    * anomaly arithmetic and the OHLC bars can never silently diverge. */
  private def valueMicroDec: Column =
    col("value").cast("decimal(18,6)") * lit(1000000L)

  /** Exact per-row micro-unit conversion shared by ev12 and its streaming
    * twin ([[graft.streaming.GraftStreaming.ohlcStream]]) — the HALF_UP
    * scale-6 decimal cast both engines round identically; keeping ONE
    * definition keeps the streamed bars hash-equal to the batch bars. */
  def valueMicro: Column = valueMicroDec.cast("long")

  /** ev12: OHLC bars — open/high/low/close per (event_type, 1-hour bucket),
    * the time-series downsampling shape every monitoring/market pipeline
    * runs. Open/close are `min_by`/`max_by` over a zero-padded
    * `(ts_micros ‖ event_id)` string key ([[ohlcOrdKey]]) — a total order
    * both engines compare identically — so the WHOLE bar is ONE
    * partial-aggregable groupBy: map-side combine keeps per-task state at
    * one row per (type, hour), no window, no sort, one low-cardinality
    * shuffle. Values are exact micro-units. */
  def ev12Ohlc(s: SparkSession, dir: String): DataFrame = {
    val vMicro = valueMicro
    val ordKey = ohlcOrdKey
    Tables.events(s, dir)
      .select(col("event_type"), window(col("ts"), "1 hour")("start").as("ws"),
        vMicro.as("v"), ordKey.as("ord"))
      .groupBy(col("event_type"), col("ws"))
      .agg(count(lit(1)).as("n"),
        min_by(col("v"), col("ord")).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), col("ord")).as("close"))
      .orderBy(col("event_type"), col("ws"))
  }

  val ev12Sql: String =
    """SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS ws,
      |  count(*) AS n,
      |  arg_min(v, ord) AS open, max(v) AS high, min(v) AS low,
      |  arg_max(v, ord) AS close
      |FROM (SELECT event_type, ts,
      |        CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
      |        lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
      |          || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
      |      FROM events)
      |GROUP BY 1, 2 ORDER BY event_type, ws""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev1_window_agg" -> (ev1WindowAgg _),
    "ev2_sessionize" -> (ev2Sessionize _),
    "ev3_asof_join"  -> (ev3AsofJoin _),
    "ev4_range_join" -> (ev4RangeJoin _),
    "ev5_session_window" -> (ev5SessionWindow _),
    "ev6_resample"   -> (ev6Resample _),
    "ev7_anomaly"    -> (ev7Anomaly _),
    "ev8_funnel"     -> (ev8Funnel _),
    "ev9_rolling_count" -> (ev9RollingCount _),
    "ev10_retention" -> (ev10Retention _),
    "ev11_transitions" -> (ev11Transitions _),
    "ev12_ohlc"      -> (ev12Ohlc _),
  )

  val oracles: Map[String, String] = Map(
    "ev1_window_agg" -> ev1Sql,
    "ev2_sessionize" -> ev2Sql,
    "ev3_asof_join"  -> ev3Sql,
    "ev4_range_join" -> ev4Sql,
    "ev5_session_window" -> ev5Sql,
    "ev6_resample"   -> ev6Sql,
    "ev7_anomaly"    -> ev7Sql,
    "ev8_funnel"     -> ev8Sql,
    "ev9_rolling_count" -> ev9Sql,
    "ev10_retention" -> ev10Sql,
    "ev11_transitions" -> ev11Sql,
    "ev12_ohlc"      -> ev12Sql,
  )
}
