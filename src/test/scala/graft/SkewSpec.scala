package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial-shape (zipf) pins for the skew toolbox (round-18
  * verdict #7): the salted join and the bucket cap are justified by
  * skew arguments but the TPC-H-uniform fixtures never exercise them —
  * these tests construct the mega-key shape they exist for and pin
  * that the guarded plans BEAT their naive forms on it, with value
  * transparency (salting/caps must never change the answer, only the
  * movement). Timing assertions use min-of-2 reps per side and demand
  * an honest win, not a margin-of-error one.
  */
class SkewSpec extends SparkTestBase {

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def minTime(reps: Int)(body: => Unit): Double =
    (1 to reps).map(_ => timed(body)._2).min

  test("zipf mega-key join: the salted plan beats the naive shuffle " +
      "join and is value-transparent") {
    // the shared test session is 4-partition-narrow (right for the
    // bounded suites, wrong for a skew demonstration: the salt needs
    // somewhere to spread) — widen around this test
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try zipfJoinBody()
    finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  private def zipfJoinBody(): Unit = {
    // one mega-key owning 90% of an 8M-row fact side — the shape
    // where the naive shuffle join serializes the hot key into ONE
    // task's sort while every other core idles (8M keeps both plans
    // spill-free inside the shared test JVM heap, so the comparison
    // measures the straggler, not allocator pressure; in a fresh JVM
    // the same shape at 16M measures 10.1s naive vs 3.2s salted wall)
    val n = 8000000L
    val fact = spark.range(n).select(
      when(col("id") % 10 < 9, lit(0L))
        .otherwise(pmod(col("id"), lit(1000)) + 1).as("k"),
      (col("id") % 97).cast("double").as("v"),
      col("id"))
      .localCheckpoint(true) // freeze input: both plans read equal bytes
    val dim = spark.range(1001).select(col("id").as("k"),
      concat(lit("g_"), col("id") % 10).as("grp"))
      .localCheckpoint(true)
    // 64 salts over 32 shuffle partitions: with ~#partitions salts the
    // hot sub-keys land 2-5 per partition by birthday collision
    // (measured: a 4.5s task holding 5 of 16 sub-keys) — oversalting
    // by 2x the partition count evens the allocation
    val salts = 64
    def naive: DataFrame = fact.join(dim.hint("merge"), Seq("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    def salted: DataFrame = {
      val f = fact.withColumn("salt", pmod(hash(col("id")), lit(salts)))
      val d = dim.withColumn("salt",
        explode(array((0 until salts).map(lit(_)): _*)))
      f.join(d.hint("merge"), Seq("k", "salt"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    }
    // value transparency first (also the warm-up run for both shapes)
    def snap(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.round(r.getDouble(2)))).sortBy(_._1).toSeq
    assert(snap(salted) == snap(naive),
      "salting must never change the join's answer")
    // the binding pin is the STRAGGLER, not the suite wall-clock: at
    // 1000 executors the naive plan's wall time IS its slowest task
    // (one core sorts the mega-key while 999 idle), so the property
    // that must hold is that salting collapses the max task duration.
    // Max-task is also robust to host contention here in a way total
    // wall time is not — both runs contend equally per task.
    val listener = new org.apache.spark.scheduler.SparkListener {
      val tasks = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks.add((t.stageId, t.taskInfo.duration))
    }
    def maxTaskOf(body: => Unit): (Double, Double) = {
      spark.sparkContext.addSparkListener(listener)
      try {
        listener.tasks.clear()
        val (_, wall) = timed(body)
        // the listener bus is async (and private) — poll until the
        // task log stabilizes
        var prev = -1
        var spins = 0
        while (listener.tasks.size != prev && spins < 20) {
          prev = listener.tasks.size; Thread.sleep(100); spins += 1
        }
        import scala.jdk.CollectionConverters._
        val all = listener.tasks.asScala.toSeq
        info("top tasks (stage,ms): " + all.sortBy(-_._2).take(6).mkString(" "))
        (all.map(_._2).max / 1e3, wall)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    // STRUCTURAL comparison, AQE off for both sides: AQE's runtime
    // mitigations otherwise blur exactly what this test isolates — its
    // skew-split would re-split the naive SMJ's hot partition (but
    // only for the SMJ shape, on a re-executed stage), and at fixture
    // scale its 64MB partition coalescing merges the salted sub-keys
    // back into a handful of fat tasks (measured: 16 salts coalesced
    // to 4 tasks of 4M rows). In production the two COMPOSE — salting
    // fixes the shapes AQE cannot reach, AQE right-sizes the rest —
    // but the property pinned here is the salt's own load balance.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (mtN, tn, mtS, ts) =
      try {
        val (a, b) = maxTaskOf(naive.write.format("noop").mode("overwrite").save())
        val (c, d) = maxTaskOf(salted.write.format("noop").mode("overwrite").save())
        (a, b, c, d)
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    info(f"zipf join: naive wall=$tn%.2fs maxTask=$mtN%.2fs | " +
      f"salted wall=$ts%.2fs maxTask=$mtS%.2fs " +
      f"(straggler cut ${mtN / math.max(mtS, 1e-3)}%.1fx)")
    assert(mtS * 2 <= mtN,
      f"salting must at least halve the straggler task " +
        f"(naive max-task $mtN%.2fs vs salted $mtS%.2fs)")
  }

  test("zipf mega-bucket: the member cap bounds pair volume and beats " +
      "the uncapped expansion") {
    import graft.ops.Buckets
    // one bucket holding 20000 of 20200 members — the recrawl-density
    // shape where uncapped pair emission goes quadratic (20000 choose 2
    // ≈ 200M pairs from ONE bucket)
    val mega = 20000L
    val df = spark.range(mega + 200).select(
      when(col("id") < mega, lit("MEGA"))
        .otherwise(concat(lit("b"), col("id"))).as("bucket"),
      col("id").as("doc"))
      .localCheckpoint(true)
    def pairCount(cap: Int): Long =
      Buckets.members(df, Seq("bucket"), col("doc"), col("doc"), cap)
        .select(explode(col("ids")).as("a"), col("ids"))
        .select(col("a"), explode(col("ids")).as("b"))
        .filter(col("a") < col("b"))
        .count()
    val capped = pairCount(Buckets.MaxBucket)
    val uncapped = pairCount(Int.MaxValue)
    // exact volume law: the cap turns the mega bucket quadratic into a
    // constant — cap·(cap−1)/2 pairs — and reports what it dropped
    val c = Buckets.MaxBucket.toLong
    assert(capped == c * (c - 1) / 2,
      s"capped mega-bucket must emit exactly cap-choose-2 pairs, got $capped")
    assert(uncapped == mega * (mega - 1) / 2,
      s"uncapped truth volume sanity, got $uncapped")
    val overflow = Buckets.overflowTotal(
      Buckets.members(df, Seq("bucket"), col("doc"), col("doc"),
        Buckets.MaxBucket))
    assert(overflow == mega - Buckets.MaxBucket,
      s"the truncation metric must report the dropped members, got $overflow")
    val tc = minTime(2)(pairCount(Buckets.MaxBucket))
    val tu = minTime(2)(pairCount(Int.MaxValue))
    info(f"zipf bucket: uncapped=$tu%.2fs capped=$tc%.2fs (${tu / tc}%.1fx)")
    assert(tc * 2 <= tu,
      f"the capped expansion ($tc%.2fs) must decisively beat the " +
        f"quadratic mega-bucket ($tu%.2fs)")
  }

  test("GenScale zipf mode plants the declared ~1% mega-key density") {
    val li = graft.ops.Util.t(spark, sfDir, "lineitem")
    val skewed = GenScale.megaKey(li, "l_suppkey",
      Seq("l_orderkey", "l_linenumber"))
    val n = skewed.count()
    val natural = li.filter(col("l_suppkey") === 0L).count()
    val hot = skewed.filter(col("l_suppkey") === 0L).count()
    // the PLANTED increment is the declared ~1% — key 0 also keeps its
    // natural rows (at sf0.001 there are only 10 suppliers, so the
    // natural density alone is ~9%)
    val frac = (hot - natural).toDouble / n
    info(f"mega-key density: planted ${hot - natural} of $n rows = $frac%.4f"
      + s" (natural $natural)")
    assert(frac >= 0.005 && frac <= 0.02,
      s"~1% of rows must be rerouted to the mega-key, got $frac")
    // determinism: the same transform twice is identical
    val again = GenScale.megaKey(li, "l_suppkey",
      Seq("l_orderkey", "l_linenumber"))
    assert(again.exceptAll(skewed).isEmpty && skewed.exceptAll(again).isEmpty)
  }
}
