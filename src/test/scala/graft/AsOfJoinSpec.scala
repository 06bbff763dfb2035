package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.plans.AsOf

/** The native as-of operator (custom LogicalPlan + Strategy +
  * SparkPlan) against the oracle-checked C10 window trick, plus the
  * merge edge cases a fixture can't guarantee to hit. Every
  * equivalence case runs through BOTH physical forms — the
  * co-partitioned merge and the broadcast lookup — by toggling the
  * broadcast threshold. */
class AsOfJoinSpec extends SparkTestBase {

  /** Run `body` once per physical path: broadcast (default threshold —
    * test inputs are tiny, so the right side always qualifies) and
    * merge (threshold -1 disables broadcast). */
  private def bothPaths[A](body: String => A): Unit = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "10MB"); body("broadcast")
      spark.conf.set(key, "-1"); body("merge")
    } finally spark.conf.set(key, prev)
    ()
  }

  test("native as-of equals the window-trick C10 row-for-row (both paths)") {
    bothPaths { path =>
      val native = Joins.joinAsofNative(spark, sfDir).collect().toSeq
      val trick = Joins.joinAsof(spark, sfDir).collect().toSeq
      assert(native.nonEmpty, path)
      assert(native == trick, path)
    }
  }

  test("strategy picks broadcast for a small right side, merge above threshold") {
    bothPaths { path =>
      val p = Joins.joinAsofNative(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        "the native path must not fall back to a window")
      if (path == "broadcast") {
        // nodeName renders without the Exec suffix
        assert(p.contains("BroadcastAsOfJoin"), p)
        assert(p.contains("BroadcastExchange"), p)
        // probe side moves nothing: the only hash exchange would be a
        // regression (the presentation sort is a range exchange)
        assert(!p.linesIterator.exists(l =>
          l.contains("Exchange hashpartitioning")), p)
      } else {
        assert(p.contains("AsOfJoin") && !p.contains("BroadcastAsOfJoin"), p)
        // two inputs co-partitioned on the key + the final
        // presentation sort — nothing else may move data
        assert(p.linesIterator.count(_.contains("Exchange")) == 3, p)
      }
    }
  }

  test("merge edges: ties, no prior, null keys, unmatched right keys") {
    bothPaths { path =>
    import spark.implicits._
    // left: probes; right: timeline. Order tuple is (t, id) — a right
    // row with equal t but smaller id IS prior (lexicographic strict <)
    val left = Seq(
      (1L, "u1", 10L), // right (10,6): tie on t but 6 !< 1 → picks (5,0)
      (2L, "u1", 5L),  // right (5,0): tie on t, 0 < 2 → prior
      (3L, "u2", 7L),  // u2's only right row is at t=8 → no match
      (4L, null, 9L),  // null key groups with the null-key right row
      (5L, "u9", 9L)   // u9 absent from right → no match
    ).toDF("id", "k", "t")
    val right = Seq(
      (0L, "u1", 5L), (6L, "u1", 10L), (7L, "u1", 11L),
      (8L, "u2", 8L), (9L, null, 2L)
    ).toDF("r_id", "r_k", "r_t")
    val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
        Seq("t", "id"), Seq("r_t", "r_id"))
      .select($"id", $"r_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong)).toMap
    assert(got == Map(
      1L -> Some(0L), 2L -> Some(0L), 3L -> None, 4L -> Some(9L),
      5L -> None), s"$path: $got")
    }
  }

  test("randomized differential: both native paths equal a plain-Scala reference") {
    import spark.implicits._
    // tight domains force the shapes the fixture can't guarantee:
    // heavy (user, ts) ties, single-event users, probe-first users
    bothPaths { path =>
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val events = (0L until 300L).map { id =>
        (id, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong,
          rnd.nextInt(4) == 0) // ~25% probes
      } // (id, user, t, isProbe)
      // reference: per user, sort by (t, id); match = greatest strictly
      // smaller (t, id) among ALL events of the user
      val expected = {
        val ord = Ordering.Tuple2[Long, Long]
        val byUser = events.groupBy(_._2)
        events.filter(_._4).map { case (id, u, t, _) =>
          val prior = byUser(u).filter(e => ord.lt((e._3, e._1), (t, id)))
          id -> (if (prior.isEmpty) None
            else Some(prior.maxBy(e => (e._3, e._1))(ord)._1))
        }.toMap
      }
      val left = events.filter(_._4).map(e => (e._1, e._2, e._3))
        .toDF("id", "u", "t")
      val right = events.map(e => (e._1, e._2, e._3))
        .toDF("r_id", "r_u", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("u"), Seq("r_u"),
          Seq("t", "id"), Seq("r_t", "r_id"))
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong))
        .toMap
      assert(got == expected, s"$path seed $seed")
    }
    }
  }

  test("every left row of an empty right side keeps NULLs") {
    bothPaths { path =>
      import spark.implicits._
      val left = Seq((1L, "a", 3L), (2L, "b", 4L)).toDF("id", "k", "t")
      val right = Seq.empty[(Long, String, Long)].toDF("r_id", "r_k", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t"), Seq("r_t"))
        .select($"id", $"r_id").collect()
      assert(got.length == 2 && got.forall(_.isNullAt(1)), path)
    }
  }

  test("forward direction picks the earliest strictly-after row (both paths)") {
    bothPaths { path =>
      import spark.implicits._
      val left = Seq(
        (1L, "u1", 10L), // nexts at 10(no: tie, id 6 but tuple (10,6) > (10,1)? yes strictly greater) — see expected
        (2L, "u1", 5L),  // tie at t=5 with r_id 0: (5,0) < (5,2) so NOT after; next is (10,6)
        (3L, "u2", 8L),  // u2's only row is AT t=8, tuple (8,8) > (8,3) → matches
        (4L, "u9", 1L)   // no u9 rows → NULL
      ).toDF("id", "k", "t")
      val right = Seq(
        (0L, "u1", 5L), (6L, "u1", 10L), (7L, "u1", 11L),
        (8L, "u2", 8L)
      ).toDF("r_id", "r_k", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t", "id"), Seq("r_t", "r_id"), direction = "forward")
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong)).toMap
      assert(got == Map(
        1L -> Some(6L), 2L -> Some(6L), 3L -> Some(8L), 4L -> None), path)
    }
  }

  test("tolerance masks matches farther than the bound (both paths, both directions)") {
    bothPaths { path =>
      import spark.implicits._
      val left = Seq(
        (1L, "u1", 100L), // prior at 95 (gap 5): inside tol 10
        (2L, "u1", 200L), // prior at 100-ish? nearest prior 101 → gap 99: outside
        (3L, "u2", 50L)   // no prior at all
      ).toDF("id", "k", "t")
      val right = Seq(
        (10L, "u1", 95L), (11L, "u1", 101L), (12L, "u2", 60L)
      ).toDF("r_id", "r_k", "r_t")
      val back = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t", "id"), Seq("r_t", "r_id"), tolerance = Some(10L))
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong)).toMap
      assert(back == Map(1L -> Some(10L), 2L -> None, 3L -> None), path)
      val fwd = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t", "id"), Seq("r_t", "r_id"),
          direction = "forward", tolerance = Some(10L))
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong)).toMap
      // 1: next is 101, gap 1 → match; 2: no next → NULL; 3: next 60, gap 10 → match (<=)
      assert(fwd == Map(1L -> Some(11L), 2L -> None, 3L -> Some(12L)), path)
    }
  }

  test("randomized differential: forward + tolerance equal a plain-Scala reference") {
    import spark.implicits._
    bothPaths { path =>
    for (seed <- Seq(11, 12)) {
      val rnd = new scala.util.Random(seed)
      val events = (0L until 300L).map { id =>
        (id, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong,
          rnd.nextInt(4) == 0)
      }
      val tol = 5L
      val ord = Ordering.Tuple2[Long, Long]
      val byUser = events.groupBy(_._2)
      val expected = events.filter(_._4).map { case (id, u, t, _) =>
        val after = byUser(u).filter(e => ord.gt((e._3, e._1), (t, id)))
        val pick = if (after.isEmpty) None
          else Some(after.minBy(e => (e._3, e._1))(ord))
        id -> pick.filter(e => e._3 - t <= tol).map(_._1)
      }.toMap
      val left = events.filter(_._4).map(e => (e._1, e._2, e._3))
        .toDF("id", "u", "t")
      val right = events.map(e => (e._1, e._2, e._3))
        .toDF("r_id", "r_u", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("u"), Seq("r_u"),
          Seq("t", "id"), Seq("r_t", "r_id"),
          direction = "forward", tolerance = Some(tol))
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong))
        .toMap
      assert(got == expected, s"$path seed $seed")
    }
    }
  }

  test("nearest direction: closer side wins, ties prefer backward (both paths)") {
    bothPaths { path =>
      import spark.implicits._
      val left = Seq(
        (1L, "a", 10L), // backward at 7 (gap 3), forward at 12 (gap 2) -> fwd
        (2L, "a", 5L),  // backward at 7? no - strictly before: none; fwd 7 (gap 2)
        (3L, "a", 20L), // backward 12 (gap 8), no forward -> bwd
        (4L, "b", 10L), // exact tie: 8 (gap 2) vs 12 (gap 2) -> backward
        (5L, "c", 1L)   // no events at all -> NULL
      ).toDF("id", "k", "t")
      val right = Seq(
        (100L, "a", 7L), (101L, "a", 12L),
        (102L, "b", 8L), (103L, "b", 12L)
      ).toDF("r_id", "r_k", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t"), Seq("r_t"), direction = "nearest")
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong))
        .toMap
      assert(got == Map(1L -> Some(101L), 2L -> Some(100L),
        3L -> Some(101L), 4L -> Some(102L), 5L -> None), path)
    }
  }

  test("nearest excludes the tuple-equal row; equal-t smaller-id is a gap-0 backward match") {
    bothPaths { path =>
      import spark.implicits._
      // self-join shape: the probe row itself is on the right with the
      // IDENTICAL (t, id) tuple and must never self-match
      val left = Seq((10L, "a", 5L)).toDF("id", "k", "t")
      val right = Seq((9L, "a", 5L), (10L, "a", 5L), (11L, "a", 5L))
        .toDF("r_id", "r_k", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t", "id"), Seq("r_t", "r_id"), direction = "nearest")
        .select($"id", $"r_id").collect()
      // backward candidate (5,9) gap 0; forward candidate (5,11) gap 0;
      // tie -> backward
      assert(got.length == 1 && got.head.getLong(1) == 9L, path)
    }
  }

  test("nearest + tolerance masks both sides independently (both paths)") {
    bothPaths { path =>
      import spark.implicits._
      val left = Seq((1L, "a", 10L), (2L, "a", 100L)).toDF("id", "k", "t")
      val right = Seq((50L, "a", 4L), (51L, "a", 13L)).toDF("r_id", "r_k", "r_t")
      val got = AsOf.joinAsOf(left, right, Seq("k"), Seq("r_k"),
          Seq("t"), Seq("r_t"), direction = "nearest", tolerance = Some(5L))
        .select($"id", $"r_id").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong))
        .toMap
      // id 1: backward gap 6 > 5 masked, forward gap 3 ok -> 51
      // id 2: nearest (51) at gap 87 -> masked entirely, never a fallback
      assert(got == Map(1L -> Some(51L), 2L -> None), path)
    }
  }

  test("randomized differential: nearest equals a plain-Scala reference (both paths)") {
    import spark.implicits._
    bothPaths { path =>
      for (seed <- Seq(11, 12, 13)) {
        val rnd = new scala.util.Random(seed)
        val events = (0L until 300L).map { id =>
          (id, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong,
            rnd.nextInt(4) == 0)
        }
        val ord = Ordering.Tuple2[Long, Long]
        val byUser = events.groupBy(_._2)
        val expected = events.filter(_._4).map { case (id, u, t, _) =>
          val others = byUser(u)
          val bwd = others.filter(e => ord.lt((e._3, e._1), (t, id)))
            .sortBy(e => (e._3, e._1))(ord).lastOption
          val fwd = others.filter(e => ord.gt((e._3, e._1), (t, id)))
            .sortBy(e => (e._3, e._1))(ord).headOption
          val db = bwd.map(e => t - e._3).getOrElse(Long.MaxValue)
          val df = fwd.map(e => e._3 - t).getOrElse(Long.MaxValue)
          id -> (if (db == Long.MaxValue && df == Long.MaxValue) None
            else if (db <= df) bwd.map(_._1) else fwd.map(_._1))
        }.toMap
        val left = events.filter(_._4).map(e => (e._1, e._2, e._3))
          .toDF("id", "u", "t")
        val right = events.map(e => (e._1, e._2, e._3))
          .toDF("r_id", "r_u", "r_t")
        val got = AsOf.joinAsOf(left, right, Seq("u"), Seq("r_u"),
            Seq("t", "id"), Seq("r_t", "r_id"), direction = "nearest")
          .select($"id", $"r_id").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString.toLong))
          .toMap
        assert(got == expected, s"$path seed $seed")
      }
    }
  }

  test("registered tolerance/forward queries execute against the fixture") {
    val tolRows = Joins.joinAsofTolerance(spark, sfDir).collect()
    assert(tolRows.nonEmpty)
    // the tolerance must actually bite: some purchases matched, some masked
    assert(tolRows.exists(!_.isNullAt(2)) && tolRows.exists(_.isNullAt(2)))
    assert(tolRows.filterNot(_.isNullAt(4))
      .forall(_.getLong(4) <= 6L * 3600 * 1000000))
    val fwdRows = Joins.joinAsofForward(spark, sfDir).collect()
    assert(fwdRows.nonEmpty)
    assert(fwdRows.filterNot(_.isNullAt(4)).forall(_.getLong(4) > 0))
  }
}
