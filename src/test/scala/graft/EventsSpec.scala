package graft

import graft.ops.{Events, Util}
import org.apache.spark.sql.functions._

/** Conservation invariants for the event-sequence analytics (the
  * oracle pins exact values; these pin the laws that must hold on ANY
  * event log). */
class EventsSpec extends SparkTestBase {

  test("path transitions conserve steps: sum(n) = events - users (J13)") {
    val ev = Util.t(spark, sfDir, "events")
    val nEvents = ev.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    val total = Events.pathTransitions(spark, sfDir)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    // each user with k events contributes exactly k-1 consecutive steps
    assert(total == nEvents - nUsers)
  }

  test("sessionize splits exactly at gaps > gapUs on a known log (J16)") {
    import spark.implicits._
    val min = 60000000L // one minute in micros
    // user 1: events at 0, 10, 20 min (one session), then 60, 65 min
    // (second session: 40-min gap), then 200 min (third, singleton)
    // user 2: one event (one singleton session)
    val ev = Seq(
      (1L, 1L, 0L * min), (1L, 2L, 10L * min), (1L, 3L, 20L * min),
      (1L, 4L, 60L * min), (1L, 5L, 65L * min), (1L, 6L, 200L * min),
      (2L, 7L, 5L * min)
    ).toDF("user_id", "event_id", "tus")
    val out = Events.sessionizeEvents(ev, gapUs = 30L * min)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    // user 1: 3 sessions, 6 events, active = (20-0) + (65-60) + 0 min
    assert(out(1L) == ((3L, 6L, 25L * min)))
    // user 2: 1 singleton session, zero duration
    assert(out(2L) == ((1L, 1L, 0L)))
  }

  test("sessionize conserves events and bounds sessions (J16)") {
    val ev = Util.t(spark, sfDir, "events")
    val out = Events.sessionizeBatch(spark, sfDir)
    assert(out.agg(sum(col("n_events"))).collect()(0).getLong(0) == ev.count())
    assert(out.count() == ev.select(col("user_id")).distinct().count())
    val bad = out.filter(col("n_sessions") < 1 ||
      col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
  }

  test("a tie on tus stays within one session regardless of event_id order (J16)") {
    import spark.implicits._
    val ev = Seq((1L, 2L, 100L), (1L, 1L, 100L), (1L, 3L, 100L))
      .toDF("user_id", "event_id", "tus")
    val r = Events.sessionizeEvents(ev, gapUs = 1L).collect()(0)
    assert(r.getLong(1) == 1L && r.getLong(2) == 3L)
  }

  test("resample grid is dense and ffill carries the prior value (J17)") {
    val rows = Events.eventsResampleFfill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getLong(1))
      // dense contiguous span, in output order
      assert(days.max - days.min + 1 == days.length)
      assert(days.sameElements(days.sorted))
      // the grid starts at the first ACTIVE day — always observed
      assert(rs.head.getBoolean(3))
      // value is never NULL after the first day, and every unobserved
      // day copies the previous day's value exactly
      rs.sliding(2).foreach {
        case Array(p, c) =>
          assert(!c.isNullAt(2))
          if (!c.getBoolean(3)) assert(c.getDouble(2) == p.getDouble(2))
        case _ =>
      }
    }
    // observed days are exactly the active (user, day) pairs
    val observed = rows.filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1))).toSet
    val active = Util.t(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(observed == active)
  }

  test("interpolation hits the straight line on a known gap (J18)") {
    import spark.implicits._
    val us = 86400000000L
    // user 1: observations at day 0 (10.0) and day 3 (40.0) — days 1, 2
    // interpolate to 20.0 and 30.0; user 2: single observation, no gaps
    val ev = Seq(
      (1L, 1L, 0L * us, 10.0), (1L, 2L, 3L * us + 5L, 40.0),
      (2L, 3L, 1L * us, 7.0)
    ).toDF("user_id", "event_id", "tus", "value")
      .selectExpr("user_id", "event_id",
        "timestamp_micros(tus) AS ts", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_j18_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.eventsInterpolate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got((1L, 0L)) == ((10.0, true)))
    assert(got((1L, 1L)) == ((20.0, false)))
    assert(got((1L, 2L)) == ((30.0, false)))
    assert(got((1L, 3L)) == ((40.0, true)))
    assert(got((2L, 1L)) == ((7.0, true)))
    assert(got.size == 5)
  }

  test("interpolated values stay within their neighbor envelope (J18)") {
    val rows = Events.eventsInterpolate(spark, sfDir).collect()
    val ff = Events.eventsResampleFfill(spark, sfDir).collect()
    assert(rows.length == ff.length)
    // observed rows agree exactly with the ffill view's observed rows
    val obsI = rows.filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val obsF = ff.filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(obsI.sameElements(obsF))
  }

  test("path transition shares sum to 1 per source type (J13)") {
    val bad = Events.pathTransitions(spark, sfDir)
      .groupBy(col("from_type")).agg(sum(col("share")).as("s"))
      .collect().filter(r => math.abs(r.getDouble(1) - 1.0) > 1e-4)
    // each share is exact-decimal truncated at 6dp; ≤5 terms per type
    assert(bad.isEmpty, bad.mkString(", "))
  }
  test("rolling z-score null/flag laws hold on the fixture (J19)") {
    val rows = graft.ops.Events.eventsAnomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nPrev, zNull, flag) = (r.getLong(3), r.isNullAt(4), r.getBoolean(5))
      // no baseline (< 3 predecessors) -> no score, never flagged
      if (nPrev < 3) assert(zNull && !flag)
      // a flag requires a score beyond the 2-sigma band
      if (flag) assert(!zNull && math.abs(r.getDouble(4)) > 2.0)
      if (!zNull && math.abs(r.getDouble(4)) <= 2.0) assert(!flag)
    }
    // the screen is non-vacuous on the fixture: both flags occur
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("J23: DAU/WAU laws + direct-window cross-check") {
    val rows = Events.eventsActiveUsers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val du = Util.t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    for (r <- rows) {
      val (day, dau, wau) = (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2))
      assert(dau <= wau, s"$day: DAU $dau must be <= WAU $wau")
      assert(math.abs(r.getDouble(3) - dau.toDouble / wau) < 1e-6)
      // direct recount of the trailing-7-day distinct-user window
      val direct = du.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length
      assert(wau == direct.toLong, s"$day: WAU $wau != direct $direct")
      assert(dau == du.count(_._1 == day).toLong)
    }
    // every observed day reports (inner join drops nothing real)
    assert(rows.length == du.map(_._1).distinct.length)
  }

  test("J36 life table: exit mass partitions the user base, the " +
    "at-risk set covers each day's exits, and the ledger balances") {
    val rows = graft.ops.Events.eventsSurvival(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val users = graft.ops.Util.t(spark, sfDir, "events")
      .select("user_id").distinct().count()
    var d = 0L; var c = 0L
    for (r <- rows) {
      val (nRisk, de, ce) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // users exiting at t are still at risk at t
      assert(nRisk >= de + ce, s"${r.get(0)}: risk $nRisk < $de+$ce")
      if (nRisk > 0)
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      d += de; c += ce
    }
    // every user exits exactly once: death xor censoring
    assert(d + c == users, s"exits ${d + c} != users $users")
    // the fixture plants both outcomes — the table is non-vacuous
    assert(d > 0 && c > 0)
  }

  test("stickiness bounds and user-day mass conservation (J37)") {
    import org.apache.spark.sql.functions.to_date
    val out = Events.eventsStickiness(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
      // WAU is at most the summed DAUs, which is at most days*WAU
      assert(r.getAs[Long]("wau") <= r.getAs[Long]("dau_total"))
      assert(r.getAs[Long]("dau_total") <=
        r.getAs[Long]("n_days") * r.getAs[Long]("wau"))
    }
    val ud = Util.t(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().count()
    assert(out.map(_.getAs[Long]("dau_total")).sum == ud)
  }

  test("power curve: descending cumulative conserves the user base (J38)") {
    val out = Events.eventsPowerCurve(spark, sfDir)
      .orderBy(col("active_days")).collect()
    val nUsers = Util.t(spark, sfDir, "events")
      .select(col("user_id")).distinct().count()
    // everyone has at least the minimum observed activity
    assert(out.head.getAs[Long]("cum_users_at_least") == nUsers)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_users_at_least") >=
          b.getAs[Long]("cum_users_at_least"))
      case _ =>
    }
    assert(out.map(_.getAs[Long]("n_users")).sum == nUsers)
  }

  test("streak islands segment a known log correctly (E12)") {
    import spark.implicits._
    // user 1: 1,2,3,2,3,4,5 -> up-runs of 3 (d1-3) and 4 (d4-7)
    // user 2: 9,9,9        -> ties never extend a run (strict >)
    // user 3: 5            -> singleton run
    val daily = (Seq((1L, 1, 1L), (1L, 2, 2L), (1L, 3, 3L), (1L, 4, 2L),
      (1L, 5, 3L), (1L, 6, 4L), (1L, 7, 5L),
      (2L, 1, 9L), (2L, 2, 9L), (2L, 3, 9L),
      (3L, 1, 5L)))
      .toDF("user_id", "d", "v")
      .select(col("user_id"), expr("date_add(DATE '2024-01-01', d)").as("day"),
        col("v"))
      .repartition(3)
    val out = graft.ops.Windows.streaksCore(daily)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 7L, 4L), (2L, 3L, 1L), (3L, 1L, 1L)))
  }

  // ---- J44 CUSUM change point ----

  test("J44: a planted level shift is flagged on the shift boundary") {
    import spark.implicits._
    // 10 days at level 10, then 10 days at level 30: |CUSUM| of
    // dev = days·cnt − total peaks exactly on the last low day
    val daily = (1 to 20).map { d =>
      ("shift", java.sql.Date.valueOf(f"2024-01-$d%02d"),
        if (d <= 10) 10L else 30L)
    }.toDF("event_type", "day", "cnt").repartition(3)
    val out = Events.changepointCore(daily).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDate(1).toString == "2024-01-10",
      s"change day was ${r.getDate(1)}")
    assert(r.getLong(3) == 20L && r.getLong(4) == 400L)
    // CUSUM at the peak: 10 days × (20·10 − 400) = −2000
    assert(r.getLong(5) == -2000L)
  }

  test("J44: CUSUM is zero-sum — a constant series never exceeds 0") {
    import spark.implicits._
    val daily = (1 to 15).map(d =>
      ("flat", java.sql.Date.valueOf(f"2024-02-$d%02d"), 7L))
      .toDF("event_type", "day", "cnt")
    val r = Events.changepointCore(daily).collect().head
    assert(r.getLong(5) == 0L, "constant series ⇒ dev = 0 everywhere")
    // deterministic tie-break: earliest day wins when all CUSUMs tie
    assert(r.getDate(1).toString == "2024-02-01")
  }

  // ---- J45 top user paths ----

  test("J45: planted paths count by user support; the 8-event cap binds") {
    import spark.implicits._
    // 3 users walk view>click>buy, 2 users walk view>view; one power
    // user emits 12 alternating events — only the first 8 may count
    val rows =
      (1 to 3).flatMap(u => Seq(
        (u.toLong, "view", 1L, u * 100L), (u.toLong, "click", 2L, u * 100L + 1),
        (u.toLong, "buy", 3L, u * 100L + 2))) ++
      (4 to 5).flatMap(u => Seq(
        (u.toLong, "view", 1L, u * 100L), (u.toLong, "view", 2L, u * 100L + 1))) ++
      (1 to 12).map(i => (9L, if (i % 2 == 1) "a" else "b", i.toLong, 900L + i))
    val out = ops.Events.topPathsCore(
        rows.toDF("user_id", "event_type", "tus", "event_id").repartition(3))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("view>click>buy") == 3L)
    assert(out("view>view") == 2L)
    assert(out("a>b>a>b>a>b>a>b") == 1L, s"cap must stop at 8: $out")
    assert(!out.keys.exists(_.count(_ == '>') > 7), "no path exceeds 8 events")
  }

  test("J44: the fixture query yields one row per event type") {
    val out = Events.eventsChangepoint(spark, sfDir).collect()
    val types = out.map(_.getString(0)).toSeq
    assert(types == types.distinct.sorted)
    assert(out.forall(_.getLong(3) > 0L))
  }

}
