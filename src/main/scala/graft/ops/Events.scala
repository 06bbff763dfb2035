package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Event-sequence analytics over the `events` stream table — the batch
  * companions to the J-family event-time windows (SURVEY.md §2.2
  * J11/J12): ordered-funnel conversion and cohort retention, the two
  * queries every event warehouse runs daily.
  *
  * Scale shapes: all times are integer epoch micros/days (exact in both
  * engines — the `unix_micros` ↔ `epoch_us` parity idiom of the
  * J-family); per-user stage frames collapse to one row per converting
  * user before joining. The stage frames are USER-cardinality — they
  * grow linearly with the user base, so they are never hint-broadcast
  * (a forced broadcast is exactly what OOMs at 100×): the stage join
  * keys on `user_id`, the same key the `groupBy` that produced the
  * frame shuffled on, so the shuffle join co-partitions nearly free,
  * and AQE still picks a broadcast at runtime when the frame is
  * genuinely small. Each stage pass pushes its `event_type` equality
  * into the scan.
  */
object Events {

  /** J11: ordered funnel — users who viewed, then clicked AT OR AFTER
    * their first view, then purchased at or after that first qualifying
    * click. Event order matters: a click before any view does not
    * qualify (the sequencing the naive type-count funnel gets wrong).
    * One row: stage user counts. */
  def funnelConversion(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tus") >= col("v_us"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tus") >= col("c_us"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("p_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .agg(count(col("v_us")).as("n_view_users"),
        count(col("c_us")).as("n_click_after_view"),
        count(col("p_us")).as("n_purchase_after_click"))
  }

  /** J43: funnel conversion LATENCY — the time dimension J11's counts
    * flatten away: among users who completed view → qualifying click,
    * the distribution of the view→click gap (and click→purchase for
    * full converters) as discrete quantiles over exact integer
    * micros — "how long does conversion take", the second question
    * every funnel owner asks. Gaps are exact BIGINT micro
    * differences of per-user firsts (one agg per stage, J11's
    * frames); quantiles are the D37 standard-rule percentile_disc on
    * integers, so both engines select the identical element. Scale
    * shape: per-user stage frames (user-cardinality), one ≤2-group
    * exact-quantile agg over user-cardinality gap rows — at 100 TB
    * the gap relation is |users|, not |events|, and D15's
    * percentile_approx is the declared switch if even that is too
    * wide. */
  def eventsFunnelLatency(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("tus") >= col("v_us"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("tus") >= col("c_us"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("p_us"))
    val gaps =
      c.join(v, Seq("user_id"))
        .select(lit("view_to_click").as("stage"),
          (col("c_us") - col("v_us")).as("gap_us"))
        .unionByName(
          p.join(c, Seq("user_id"))
            .select(lit("click_to_purchase").as("stage"),
              (col("p_us") - col("c_us")).as("gap_us")))
    gaps.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_users"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p50_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)")
          .cast("long").as("p90_us"),
        max(col("gap_us")).as("max_us"))
      .orderBy(col("stage"))
  }

  /** J13: event-path transition matrix — per user, each consecutive
    * (event_type → next event_type) step in (ts, event_id) order,
    * counted corpus-wide, with each transition's share of its source
    * type. The first-order Markov view of user journeys (what follows
    * a view? how often does an error end the path?). Scale shape: one
    * window pass partitioned by user_id (high-cardinality key — no
    * single-task stratum), partial-agg counts, and a 25-row totals
    * join that broadcasts. */
  def pathTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    steps.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        dbl(dec(col("n")) / col("n_from")).as("share"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** J12: cohort retention — users grouped by first-activity day
    * (integer epoch day), counted distinct per week offset from their
    * cohort day. The retention triangle every growth dashboard draws;
    * exact integer day/week arithmetic in both engines. The cohort
    * frame is user-cardinality, so no broadcast hint (see object doc) —
    * the join keys on `user_id` like the `groupBy` that built it. */
  def retentionCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        expr("(day - cohort_day) DIV 7").as("offset_week"))
      .groupBy(col("cohort_day"), col("offset_week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("offset_week"))
  }

  /** J16: batch gap sessionization — the offline companion to the J3/J10
    * streaming session windows: per user, events in (ts, event_id) order
    * split into sessions wherever the gap to the previous event exceeds
    * 30 minutes (lag + cumulative new-session flag — the standard
    * island-numbering movement), then per-user session metrics: session
    * count, event count, exact-decimal events-per-session, and total
    * active micros (sum of per-session max−min). All integer micro
    * arithmetic — exact in both engines.
    *
    * Scale shape: ONE window pass partitioned by `user_id` (the
    * high-cardinality key — no single-task window), and the session
    * roll-up re-shuffles on (user_id, session_id) whose partial aggs
    * combine map-side. No broadcast, no collect; at 100× the plan is
    * unchanged. */
  def sessionizeBatch(spark: SparkSession, sfDir: String): DataFrame =
    sessionizeEvents(t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus")),
      gapUs = 1800000000L)

  /** J17: daily resample + forward fill — the gap-filling primitive
    * every time-series feature pipeline needs (metrics dashboards,
    * state-as-of-day features): per user, a dense daily grid from
    * first to last active day; each day carries the user's LAST
    * observed value (by (ts, event_id) — deterministic tie-break),
    * and unobserved days forward-fill the most recent prior value,
    * flagged `observed = false`.
    *
    * Scale shape: the daily collapse is one partial-agg `max_by` pass
    * (no window over raw events); the grid explodes bounded per-user
    * day spans (never a global calendar cross join); the fill is ONE
    * running `last(ignoreNulls)` window partitioned by the
    * high-cardinality user_id. Values pass through untouched — no
    * float arithmetic to drift. */
  def eventsResampleFfill(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyValueGrid(spark, sfDir)
      .select(col("user_id"), col("day"),
        last(col("v_day"), ignoreNulls = true).over(w).as("value"),
        col("v_day").isNotNull.as("observed"))
      .orderBy(col("user_id"), col("day"))
  }

  /** J18: daily resample + LINEAR interpolation — [[eventsResampleFfill]]'s
    * smoothing companion (sensor/metric series where a held value is
    * wrong and a straight line between observations is the standard
    * estimate). Each unobserved day takes
    * v_prev + (v_next − v_prev) · (day − d_prev)/(d_next − d_prev),
    * written as the IDENTICAL expression tree in both engines (each
    * IEEE op is correctly rounded, so an identical float walk is
    * deterministic — the graph_pagerank discipline) with a 9 dp final
    * round. The grid spans first→last ACTIVE day, so every unobserved
    * day has both neighbors — no extrapolation case.
    *
    * Scale shape: same as J17 plus one mirror-image window (backward
    * last + forward first over the same user partition — one
    * partitioning, two frames, zero extra shuffles). */
  def eventsInterpolate(spark: SparkSession, sfDir: String): DataFrame = {
    val past = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("v_day").isNotNull, col("day"))
    dailyValueGrid(spark, sfDir)
      .withColumn("vp", last(col("v_day"), ignoreNulls = true).over(past))
      .withColumn("dp", last(obsDay, ignoreNulls = true).over(past))
      .withColumn("vn", first(col("v_day"), ignoreNulls = true).over(future))
      .withColumn("dn", first(obsDay, ignoreNulls = true).over(future))
      .select(col("user_id"), col("day"),
        when(col("v_day").isNotNull, col("v_day"))
          .otherwise(round(col("vp") + (col("vn") - col("vp")) *
            ((col("day") - col("dp")).cast("double") / (col("dn") - col("dp"))),
            9))
          .as("value"),
        col("v_day").isNotNull.as("observed"))
      .orderBy(col("user_id"), col("day"))
  }

  /** Shared J17/J18 plumbing: the per-(user, day) last-value collapse
    * left-joined onto the dense per-user day grid. */
  private def dailyValueGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"), col("value"))
      .withColumn("day", expr("tus DIV 86400000000"))
      .groupBy(col("user_id"), col("day"))
      .agg(max_by(col("value"), struct(col("tus"), col("event_id")))
        .as("v_day"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
  }

  /** The sessionization core over an arbitrary (user_id, event_id, tus)
    * frame — separated so the session laws are pinnable on synthetic
    * logs with known gap structure (`EventsSpec`). */
  def sessionizeEvents(ev: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    val sessions = ev
      .withColumn("new_s",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("tus")) - min(col("tus"))).as("dur_us"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        dbl(dec(sum(col("n_ev"))) / count(lit(1))).as("events_per_session"),
        sum(col("dur_us")).as("active_us"))
      .orderBy(col("user_id"))
  }

  /** J19: rolling z-score anomaly flags — the streaming-adjacent
    * outlier screen a metrics pipeline runs per entity: each event's
    * `value` against the mean/stddev of that user's previous 5 events
    * (strictly preceding frame — the current value never smooths its
    * own baseline). Events with fewer than 3 predecessors report NULL
    * (no stable baseline), as do zero-variance baselines.
    *
    * Determinism discipline: the frame sums are EXACT DECIMAL (value
    * is 2 dp; value² rounded to its exact 4 dp before the decimal
    * cast), so both engines aggregate identical rationals; mean /
    * variance / z then run as the IDENTICAL IEEE expression tree
    * (correctly-rounded ops — the `events_interpolate` argument) with
    * one 6 dp final round. Window partitions on `user_id` (the
    * high-cardinality entity key — no global window), frame is O(1)
    * rows; one shuffle total. */
  def eventsAnomaly(spark: SparkSession, sfDir: String): DataFrame =
    anomalyScores(t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("tus")))

  /** The scoring core over an (event_id, user_id, value, tus) frame —
    * separated so `StreamingSpec` can pin the streaming J20 variant
    * ([[StreamingOps.streamingAnomaly]]) row-for-row against this
    * batch law on identical data. */
  private[graft] def anomalyScores(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
      .rowsBetween(-5, -1)
    val nP = col("n_prev").cast("double")
    val mean = col("s1").cast("double") / nP
    val varE = col("s2").cast("double") / nP - mean * mean
    val z = (col("value") - mean) / sqrt(varE)
    ev
      .withColumn("n_prev", count(col("value")).over(w))
      .withColumn("s1", sum(dec(col("value"))).over(w))
      .withColumn("s2", sum(dec(round(col("value") * col("value"), 4))).over(w))
      .select(col("event_id"), col("user_id"), col("value"), col("n_prev"),
        when(col("n_prev") >= 3 && varE > 0, round(z, 6))
          .otherwise(lit(null).cast("double")).as("zscore"))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > 2.0, lit(false)))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** J23: active-user rollup — exact DAU / trailing-7-day WAU /
    * stickiness per day, the engagement query every event warehouse
    * serves first. WAU is computed by the COVERAGE trick: each
    * distinct (day, user) pair contributes to the 7 window days it
    * covers (`sequence(day, day+6)` explode), so the rolling distinct
    * union becomes a second plain distinct — there is NO per-day
    * re-scan of a 7-day window and NO distinct-over-window (which
    * Spark cannot partial-aggregate). Days with no events stay absent
    * (the inner join keeps observed days only — a dashboard densifies
    * downstream if it wants zeros).
    *
    * Scale shape: three partial-agg passes over user-day cardinality
    * (distinct pairs → ×7 narrow explode → distinct → count) and one
    * day-keyed join of two day-cardinality frames (AQE broadcasts
    * them). Exact counts, no sketches — the D18 HLL union is the
    * declared alternative when user-day pairs themselves are too
    * many. */
  def eventsActiveUsers(spark: SparkSession, sfDir: String): DataFrame = {
    val du = t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), date_add(col("day"), 6)))
        .as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        dbl(dec(col("dau")) / col("wau")).as("stickiness"))
      .orderBy(col("day"))
  }

  /** J33: last-touch ATTRIBUTION — which event type gets credit for
    * each conversion: purchases are attributed to the immediately
    * preceding event WITHIN the same 30-minute-gap session (the J16
    * island construction), session-opening purchases to 'direct' —
    * the GA-style credit assignment every growth team reports on.
    * Assignment is pure window machinery (the island flag-sum, then
    * one lag inside the (user, session) refinement — Spark reuses the
    * user_id hash partitioning for both), so the event stream is
    * touched once with no self-join; credit is exact cents, rolled up
    * per touch type at the end — a ≤type-cardinality aggregate. */
  def eventsAttribution(spark: SparkSession, sfDir: String): DataFrame =
    attributionTouches(
      t(spark, sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("tus")))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("credit")).as("credited_cents"))
      .orderBy(col("touch"))

  /** The J33 per-conversion core over a (user_id, event_id,
    * event_type, value, tus) frame — separated so the J34 streaming
    * twin pins row-for-row equality against it in `StreamingSpec`. */
  private[graft] def attributionTouches(ev: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    ev
      .withColumn("new_s",
        when(lag(col("tus"), 1).over(wOrd).isNull ||
          col("tus") - lag(col("tus"), 1).over(wOrd) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prev_type", lag(col("event_type"), 1).over(
        Window.partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("tus"), col("event_id"))))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        coalesce(col("prev_type"), lit("direct")).as("touch"),
        cents(col("value")).as("credit"))
  }

  /** J35: cohort LTV curve — cumulative revenue per acquisition
    * cohort as it ages, the money companion to J12's retention
    * counts: users are cohorted by their FIRST event's epoch-week
    * (integer `unix_date DIV 7` — no calendar arithmetic to disagree
    * on), every purchase lands in (cohort_week, age_weeks), and the
    * running LTV is a cumulative window over the AGE axis within each
    * cohort — a window over the cohort×age matrix (tiny — weeks², not
    * events), after the heavy work collapsed in two
    * dimension-cardinality aggregations (first-event per user, then
    * the cohort rollup riding the same user_id shuffle). Exact cents
    * everywhere; the one shared join is the per-user cohort lookup,
    * broadcast-sized relative to the event stream. */
  def eventsCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        (unix_date(col("ts").cast("date")) / lit(7)).cast("long").as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cwk"))
    val cells = ev.join(cohort, Seq("user_id"))
      .withColumn("age", col("wk") - col("cwk"))
      .groupBy(col("cwk"), col("age"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(0L)).as("rev_cents"))
    val wCum = Window.partitionBy(col("cwk")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .orderBy(col("cwk"), col("age"))
  }

  /** J31: RFM segmentation — the marketing-analytics staple: per user,
    * Recency (days since last event, against the corpus max day so
    * the result is reproducible — never wall-clock), Frequency (event
    * count), Monetary (exact cents), each scored into quintiles with
    * `ntile(5)` over a FULLY TIE-BROKEN ordering (metric, then
    * user_id — ntile assigns by row position, so an unbroken tie
    * would be partition-order-dependent and flap the gate); scores
    * are oriented so 5 = best (most recent / most frequent / highest
    * spend). The three ntile windows rank the per-USER aggregate —
    * dimension cardinality, not the event stream; at 100 TB the
    * quintile cuts would come from D15's rank sketch instead of a
    * global sort, but the heavy work (events → per-user rollup) is
    * the same single map-side-combined aggregation either way. */
  def eventsRfm(spark: SparkSession, sfDir: String): DataFrame = {
    val per = t(spark, sfDir, "events")
      .select(col("user_id"), col("ts").cast("date").as("d"), col("value"))
      .groupBy(col("user_id"))
      .agg(max(unix_date(col("d"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(cents(col("value"))).as("monetary_cents"))
    val gmax = per.agg(max(col("last_day")).as("gmax"))
    per.crossJoin(broadcast(gmax))
      .withColumn("recency_days", col("gmax") - col("last_day"))
      .withColumn("r", ntile(5).over(
        Window.orderBy(col("recency_days").desc, col("user_id"))))
      .withColumn("f", ntile(5).over(
        Window.orderBy(col("frequency"), col("user_id"))))
      .withColumn("m", ntile(5).over(
        Window.orderBy(col("monetary_cents"), col("user_id"))))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
      .orderBy(col("user_id"))
  }

  /** J36: Kaplan-Meier LIFE TABLE (Kaplan & Meier 1958, public) for
    * time-to-first-HIGH-VALUE-purchase (value ≥ 100 — "conversion to
    * premium") with per-user right-censoring — the survival-analysis
    * primitive behind churn/conversion curves. Each user enters
    * observation at their first event, "dies" at their first
    * qualifying purchase, and is CENSORED at their last observed
    * event if they never convert (the value bar keeps both outcomes
    * populated at every fixture scale — bare "any purchase" converts
    * every user) (the at-risk set genuinely varies —
    * this is KM, not an empirical CDF). Per event day: the at-risk
    * count n_i, events d_i, censorings c_i, and the discrete hazard
    * d_i/n_i; S(t) = Π(1−hazard) follows by cumulative product, and
    * every input to it here is exact.
    *
    * Scale shape: ONE user_id shuffle collapses the fact table to a
    * 3-column per-user frame; everything after runs on the DAY-
    * cardinality spine (entered/exited cumulative counts via window
    * sums over the tiny ordered spine — the single-partition window
    * is over ~10² rows, never the fact table). All counts are exact
    * integers; the hazard is the sole division (one IEEE op, engine-
    * identical), NULL on an empty at-risk set rather than NaN. */
  def eventsSurvival(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type"), col("value"))
    val per = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("start_day"),
        max(col("day")).as("last_day"),
        min(when(col("event_type") === "purchase" &&
            col("value") >= 100.0, col("day"))).as("purch_day"))
      .select(col("user_id"), col("start_day"),
        coalesce(col("purch_day"), col("last_day")).as("end_day"),
        col("purch_day").isNotNull.as("is_event"))
    val spine = ev.select(col("day")).distinct()
    val starts = per.groupBy(col("start_day").as("day"))
      .agg(count(lit(1)).as("n_start"))
    val ends = per.groupBy(col("end_day").as("day"))
      .agg(count(lit(1)).as("n_end"),
        sum(when(col("is_event"), 1L).otherwise(0L)).as("d"),
        sum(when(col("is_event"), 0L).otherwise(1L)).as("c"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(starts, Seq("day"), "left")
      .join(ends, Seq("day"), "left")
      .select(col("day"),
        sum(coalesce(col("n_start"), lit(0L))).over(w).as("entered"),
        (sum(coalesce(col("n_end"), lit(0L))).over(w) -
          coalesce(col("n_end"), lit(0L))).as("exited_before"),
        coalesce(col("d"), lit(0L)).as("d"),
        coalesce(col("c"), lit(0L)).as("c"))
      .select(col("day"),
        (col("entered") - col("exited_before")).as("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        when(col("entered") - col("exited_before") > 0,
          round(col("d").cast("double") /
            (col("entered") - col("exited_before")).cast("double"), 9))
          .as("hazard"))
      .orderBy(col("day"))
  }

  /** J37: stickiness (DAU/WAU) by epoch week — the engagement ratio
    * every product-analytics engine headlines ("what share of the
    * week's users show up on an average day"). Weeks are integer
    * ⌊days-since-epoch / 7⌋ — calendar-library week functions
    * (ISO vs US, year boundaries) disagree across engines, epoch
    * arithmetic cannot. Stickiness = Σdaily-actives / (days·WAU):
    * exact integer counts, ONE IEEE division per week.
    *
    * Scale shape: one distinct over (user, day) — the fact collapse
    * every DAU query starts with — then two partial aggs to week
    * cardinality; nothing after the distinct exceeds the user-day
    * frame, and the week join is on the tiny week spine. */
  def eventsStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val ud = t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("week",
        expr("datediff(day, DATE '1970-01-01') DIV 7").cast("long"))
    val dau = ud.groupBy(col("week"), col("day"))
      .agg(count(lit(1)).as("dau"))
    val weekly = dau.groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("dau_total"))
    val wau = ud.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    weekly.join(wau, "week")
      .select(col("week"), col("n_days"), col("wau"), col("dau_total"),
        round(col("dau_total").cast("double") /
          (col("n_days") * col("wau")).cast("double"), 9).as("stickiness"))
      .orderBy(col("week"))
  }

  /** J39: inter-event time profile per event type — the cadence audit
    * behind rate-limiting, anomaly baselines, and session-gap tuning
    * (J16's 30-minute gap should come FROM this table, not folklore):
    * per user the micros gap to the previous event of the same type,
    * then per type the gap count, mean, and standard deviation. The
    * D20 moments discipline: gaps are exact integer micros, Σgap and
    * Σgap² are exact DECIMAL partial aggs, and mean/sd are one fixed
    * IEEE expression tree over those exact inputs — engine-identical.
    *
    * Scale shape: one (user, type) window (the J16 shuffle), one
    * partial agg to the ≤5-type domain; the squared sums ride
    * DECIMAL(38) so micros-scale gaps cannot wrap. */
  def eventsInterEvent(spark: SparkSession, sfDir: String): DataFrame = {
    val DL = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = interEventGaps(t(spark, sfDir, "events"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap").cast(DL)).cast("double").as("sg"),
        sum((col("gap").cast(DL) * col("gap")).cast(DL))
          .cast("double").as("sgg"))
    val n = col("n_gaps").cast("double")
    val mean = col("sg") / n
    val variance = (col("sgg") - col("sg") * col("sg") / n) / (n - 1)
    m.select(col("event_type"), col("n_gaps"),
        round(mean / 1000000.0, 6).as("mean_gap_s"),
        round(sqrt(variance) / 1000000.0, 6).as("sd_gap_s"))
      .orderBy(col("event_type"))
  }

  /** J42: day-of-week seasonality profile — events, active users, and
    * revenue by weekday: the first chart on any traffic dashboard and
    * the denominator for every "is today anomalous" check (J19's
    * z-scores should be computed WITHIN weekday at production scale).
    * Weekday is integer ⌊epoch days⌋ mod 7 (0 = Thursday) — calendar
    * DOW functions disagree across engines on the week start (Spark
    * 1=Sunday, DuckDB 0=Sunday); epoch arithmetic cannot. One narrow
    * projection + a 7-key partial agg + a 1-row broadcast total. */
  def eventsSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val byDow = t(spark, sfDir, "events")
      .select(
        expr("datediff(CAST(ts AS DATE), DATE '1970-01-01') % 7")
          .cast("long").as("dow"),
        col("user_id"), cents(col("value")).as("vc"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("vc")).as("revenue_cents"))
    val tot = broadcast(byDow.agg(sum(col("n_events")).as("total")))
    byDow.crossJoin(tot)
      .select(col("dow"), col("n_events"), col("n_users"),
        col("revenue_cents"),
        round(col("n_events").cast("double") /
          col("total").cast("double"), 6).as("share"))
      .orderBy(col("dow"))
  }

  /** J41: per-user simple exponential smoothing (α = 1/2) of daily
    * spend — the one-number "current run rate" behind alerting and
    * LTV nowcasts: s_t = y_t/2 + s_{t−1}/2, evaluated in its closed
    * form as a 16-term weighted tail (weights below 2⁻¹⁶ are noise —
    * the truncation IS the declared statistic, identical in both
    * engines). Determinism is structural: α = 1/2 makes every weight
    * an exact power of two, and dividing an integer-cents double by
    * an exact 2ᵏ only changes the exponent — each term is BIT-EXACT
    * before the 9-dp term round + exact-DECIMAL sum (the text_entropy
    * discipline), so no float walk can flap.
    *
    * Scale shape: the daily collapse is the J37 shuffle; the tail
    * expansion is a per-user join bounded at 16 rows per user (never
    * days²); one partial agg closes. The streaming twin is a
    * one-ValueState fold (the J40 pattern). */
  def eventsForecastSes(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = t(spark, sfDir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("y"))
    val wIdx = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val idx = daily.select(col("user_id"), col("y"),
      (row_number().over(wIdx) - 1).cast("long").as("t"))
    val lastd = idx.groupBy(col("user_id"))
      .agg(max(col("t")).as("tn"), count(lit(1)).as("n_days"))
    val terms = idx.join(lastd, "user_id")
      .filter(col("t") >= when(col("tn") >= 16, col("tn") - 15)
        .otherwise(lit(0L)))
      .select(col("user_id"), col("n_days"),
        when(col("t") === 0, col("tn"))
          .otherwise(col("tn") - col("t") + 1).as("k"), col("y"))
      .withColumn("term",
        round(col("y").cast("double") /
          expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)) AS DOUBLE)"),
          9).cast(org.apache.spark.sql.types.DecimalType(28, 9)))
    terms.groupBy(col("user_id"), col("n_days"))
      .agg(round(sum(col("term")).cast("double"), 6).as("ses"))
      .orderBy(col("user_id"))
  }

  /** J39 gap relation — (user_id, event_type, event_id, tus, gap)
    * rows for every event with a same-type predecessor; the seam the
    * streaming J40 processor is pinned row-equal against. */
  def interEventGaps(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tus"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("gap", col("tus") - lag(col("tus"), 1).over(w))
      .filter(col("gap").isNotNull)
  }

  /** J38: power-user curve — users bucketed by their count of active
    * days, with the "at least d days" cumulative share (Amplitude's
    * L7/L30 histogram): the one chart that separates a habit product
    * (bathtub shape) from a drive-by one (L-shape). Counts are exact
    * integers; the share division is one IEEE op per bucket.
    *
    * Scale shape: the same (user, day) distinct collapse as J37, one
    * partial agg to user cardinality, then a window over the
    * day-count DOMAIN (≤ span-of-corpus rows — bounded, the D21
    * fixed-bucket rationale); the grand total rides as a 1-row
    * broadcast. */
  def eventsPowerCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val act = t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
    val tot = broadcast(act.agg(count(lit(1)).as("n_users_total")))
    val byDays = act.groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy(col("active_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDays.crossJoin(tot)
      .select(col("active_days"), col("n_users"),
        sum(col("n_users")).over(w).as("cum_users_at_least"),
        col("n_users_total"))
      .select(col("active_days"), col("n_users"),
        col("cum_users_at_least"),
        round(col("cum_users_at_least").cast("double") /
          col("n_users_total").cast("double"), 6).as("pct_at_least"))
      .orderBy(col("active_days"))
  }

  /** J45: TOP USER PATHS — the most common early event sequences
    * ("what do users actually do first"), the full-path complement of
    * J13's pairwise transition matrix: each user's FIRST 8 events in
    * fully tie-broken (timestamp, event_id) order concatenate into a
    * path string (`view>click>purchase>…`), counted and top-20'd by
    * user support. The 8-event cap is the state bound — per-user work
    * and path-string length are O(cap) regardless of a power user's
    * event volume (an uncapped listagg melts on the heaviest user at
    * 100 TB); the rank window partitions on user_id (event-table
    * natural key, one shuffle), the path aggregate is
    * user-cardinality, and the top-20 plans TakeOrderedAndProject —
    * never a global sort. Ordering inside the aggregate is fully
    * tie-broken, the D29 listagg discipline. */
  def eventsTopPaths(spark: SparkSession, sfDir: String): DataFrame =
    topPathsCore(t(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"), col("event_id")))

  /** The path core over an arbitrary (user_id, event_type, tus,
    * event_id) frame — separated so `EventsSpec` can pin planted-path
    * counts and the 8-event cap on constructed inputs. */
  private[graft] def topPathsCore(ev: DataFrame): DataFrame = {
    val ranked = ev
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("tus"), col("event_id"))))
      .filter(col("rk") <= 8)
    val paths = ranked.groupBy(col("user_id"))
      .agg(expr(
        "listagg(event_type, '>') WITHIN GROUP (ORDER BY tus, event_id)")
        .as("path"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  /** J44: CUSUM change-point detection over the daily event-volume
    * series per event type — "which day did the level shift" as exact
    * integer arithmetic. The classic CUSUM tracks Σ(cᵢ − mean); mean
    * is fractional, so the engine scales by the day count instead:
    * devₜ = days·cₜ − total (integer, zero-sum over the series) and
    * CUSUMₜ = running Σ dev — the argmax |CUSUM| day is the change
    * point, identical to the fractional form (positive scaling
    * preserves the argmax) and hash-stable across engines because no
    * float division ever happens. Shape at 100 TB: the raw scan
    * collapses to (type, day) cardinality in ONE map-side-combined
    * pass; the running-sum window partitions by type over the DAY
    * GRID (~365 rows per type per year — bounded state, the J-family
    * discipline), never over raw events; tie-break on the earliest
    * day makes the argmax deterministic. */
  def eventsChangepoint(spark: SparkSession, sfDir: String): DataFrame =
    changepointCore(t(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")))

  /** The CUSUM core over an arbitrary (event_type, day, cnt) daily
    * series — separated so `EventsSpec` can pin the planted-shift law
    * (a synthetic series with a known level change must flag the
    * shift day) and the zero-sum law (Σdev = 0 ⇒ the CUSUM returns
    * to 0 at the series end) on constructed inputs. */
  private[graft] def changepointCore(daily: DataFrame): DataFrame = {
    val sized = daily
      .withColumn("days",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("total",
        sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = sized
      .select(col("event_type"), col("day"), col("cnt"),
        col("days"), col("total"),
        sum(col("days") * col("cnt") - col("total")).over(wRun)
          .as("cusum"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day"))
    cusum
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("cnt").as("day_count"), col("days"), col("total"),
        col("cusum").as("cusum_at_change"))
      .orderBy(col("event_type"))
  }
}
