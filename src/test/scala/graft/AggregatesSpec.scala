package graft

import org.apache.spark.sql.functions._
import graft.functions.SecondMax

/** D8 (SecondMax UDAF) and D9 (approx distinct error bound). */
class AggregatesSpec extends SparkTestBase {

  test("SecondMax returns the second-largest DISTINCT value") {
    import spark.implicits._
    val sm = udaf(SecondMax)
    val out = Seq(10L, 10L, 7L, 3L).toDF("v")
      .repartition(3) // force partial + merge path
      .agg(sm(col("v"))).collect().head.getLong(0)
    assert(out == 7L, "tied maxima must not count twice")
  }

  test("SecondMax yields Unset for groups with < 2 distinct values") {
    import spark.implicits._
    val sm = udaf(SecondMax)
    assert(Seq(5L, 5L, 5L).toDF("v").repartition(2)
      .agg(sm(col("v"))).collect().head.getLong(0) == SecondMax.Unset)
    assert(Seq(5L).toDF("v")
      .agg(sm(col("v"))).collect().head.getLong(0) == SecondMax.Unset)
  }

  test("SecondMax merge is order-insensitive across many partitions") {
    import spark.implicits._
    val sm = udaf(SecondMax)
    val vs = (1L to 100L) ++ (1L to 100L)
    val out = vs.toDF("v").repartition(7)
      .agg(sm(col("v"))).collect().head.getLong(0)
    assert(out == 99L)
  }

  test("SecondMax handles negative values including Long.MinValue+1") {
    import spark.implicits._
    val sm = udaf(SecondMax)
    val out = Seq(Long.MinValue + 1, -5L, -5L).toDF("v")
      .agg(sm(col("v"))).collect().head.getLong(0)
    assert(out == Long.MinValue + 1)
  }

  test("SecondMax rejects the reserved sentinel input") {
    intercept[IllegalArgumentException] {
      SecondMax.reduce(SecondMax.zero, Long.MinValue)
    }
  }

  test("D15: percentile_approx within its rank-error bound at every fixture scale") {
    // Greenwald-Khanna guarantee: the returned value's true rank is
    // within n/accuracy of the target rank (accuracy=1000 → 0.1%)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val approx = ops.Aggregates.aggApproxPercentile(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = graft.ops.Util.t(spark, dir, "orders")
        .select(col("o_orderstatus"),
          graft.ops.Util.cents(col("o_totalprice")).as("tpc"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
      assert(approx.keySet == exact.keySet, s"group keys diverge at $dir")
      for ((k, sorted) <- exact; (p, v) <- Seq(0.5 -> approx(k)._1, 0.99 -> approx(k)._2)) {
        val n = sorted.length
        // true rank interval of v: [#(x < v), #(x <= v)]
        val lo = sorted.count(_ < v)
        val hi = sorted.count(_ <= v)
        val target = p * n
        val eps = n / 1000.0 + 1 // bound + 1-element slack at tiny n
        assert(lo - eps <= target && target <= hi + eps,
          s"$dir group $k p=$p: value $v rank [$lo,$hi] vs target $target ± $eps")
      }
    }
  }

  test("D9: approx_count_distinct within 5% of exact per group at every fixture scale") {
    // the HLL++ error bound must hold across the full cardinality range
    // the fixtures span (~1.5k to 150k orders), not just the CI scale
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val approx = ops.Aggregates.aggApproxDistinct(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = graft.ops.Util.t(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet, s"group keys diverge at $dir")
      for ((k, e) <- exact) {
        val a = approx(k)
        assert(math.abs(a - e).toDouble / e <= 0.05,
          s"$dir group $k: approx $a vs exact $e exceeds 5%")
      }
    }
  }

  test("D18: sketch-union estimates within 5% of exact; union path merge-consistent") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = ops.Aggregates.aggSketchUnion(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val orders = graft.ops.Util.t(spark, dir, "orders")
      val exact = orders.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exactAll = orders.select(countDistinct(col("o_custkey")))
        .head().getLong(0)
      assert(got.keySet == exact.keySet + "ALL", s"scopes diverge at $dir")
      for ((k, e) <- exact + ("ALL" -> exactAll)) {
        val a = got(k)
        assert(math.abs(a - e).toDouble / e <= 0.05,
          s"$dir scope $k: sketch $a vs exact $e exceeds 5%")
      }
      // merge-consistency: the union of the per-group sketches must
      // agree with ONE whole-table sketch at the same lgK within the
      // same 5% envelope (the merged composite estimator may differ
      // from the streaming HIP estimate by design, but not materially)
      val direct = orders
        .agg(hll_sketch_estimate(
          hll_sketch_agg(col("o_custkey"), lit(12))).as("n"))
        .head().getLong(0)
      assert(math.abs(got("ALL") - direct).toDouble / math.max(direct, 1L) <= 0.05,
        s"$dir: union ${got("ALL")} vs direct sketch $direct")
    }
  }

  test("D25: persisted sketch cube rolls up LOSSLESSLY and within 5% of exact") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val got = ops.Aggregates.aggSketchPersist(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val orders = graft.ops.Util.t(spark, dir, "orders")
      // the core property: storing blobs in parquet and unioning LATER
      // must give the IDENTICAL estimate as a direct in-memory union
      // over the same cells (same bytes -> same estimate)
      val direct = orders
        .groupBy(col("o_orderstatus"), year(col("o_orderdate")).as("y"))
        .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
        .groupBy(col("o_orderstatus"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.map(g => g._1 -> g._3).toMap == direct,
        s"$dir: stored-blob rollup diverges from the direct union")
      // and the estimate itself stays inside the D9/D18 envelope
      val exact = orders.groupBy(col("o_orderstatus"))
        .agg(countDistinct(col("o_custkey")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for ((k, nCells, est) <- got) {
        assert(nCells >= 1)
        assert(math.abs(est - exact(k)).toDouble / exact(k) <= 0.05,
          s"$dir scope $k: $est vs exact ${exact(k)}")
      }
    }
  }

  test("D19: theta set-algebra estimates within 5% of exact truth") {
    // sf0.1 matters here: ~10k distinct customers per status exceeds
    // the 2^12 nominal entries, so the sketch leaves exact mode and
    // the bound is exercised in the true ESTIMATION regime (the two
    // small fixtures retain every hash and pass trivially)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val r = ops.Aggregates.aggSketchTheta(spark, dir).collect()(0)
      val got = Map(
        "n_open" -> r.getDouble(0), "n_fulfilled" -> r.getDouble(1),
        "n_union" -> r.getDouble(2), "n_both" -> r.getDouble(3),
        "n_open_only" -> r.getDouble(4), "n_fulfilled_only" -> r.getDouble(5))
      val orders = graft.ops.Util.t(spark, dir, "orders")
      def custs(status: String) = orders
        .filter(col("o_orderstatus") === status)
        .select(col("o_custkey")).distinct()
      val a = custs("O").collect().map(_.getLong(0)).toSet
      val b = custs("F").collect().map(_.getLong(0)).toSet
      val exact = Map(
        "n_open" -> a.size, "n_fulfilled" -> b.size,
        "n_union" -> (a | b).size, "n_both" -> (a & b).size,
        "n_open_only" -> (a -- b).size, "n_fulfilled_only" -> (b -- a).size)
      // direct sketches: 5% RELATIVE error (the D9/D18 bound). Set-op
      // results: theta intersection/difference error scales with the
      // UNION's sampling rate, not the result size — a small A∖B out
      // of a large universe has bounded ABSOLUTE error ∝ |A∪B| (at
      // sf0.1 the 523-row difference estimates within ~0.3% of the
      // 19k union but ~9% of itself) — so the principled bound is 5%
      // of the union
      val union = (a | b).size
      for ((k, e) <- exact) {
        val tol = k match {
          case "n_open" | "n_fulfilled" | "n_union" => 0.05 * math.max(e, 1)
          case _ => 0.05 * union
        }
        assert(math.abs(got(k) - e) <= tol,
          s"$dir $k: theta ${got(k)} vs exact $e exceeds tolerance $tol")
      }
      // composition law: A = (A∩B) ⊎ (A∖B) — theta intersect and
      // a_not_b over the same two sketches must recompose the A
      // estimate within the same envelope
      assert(math.abs(got("n_both") + got("n_open_only") - got("n_open"))
        / math.max(got("n_open"), 1.0) <= 0.05,
        s"$dir: intersect + a_not_b must recompose |A|")
    }
  }

  test("D20: moment-based corr/covar agree with Spark's streaming aggregates") {
    // the exact-moment formulation must compute the same STATISTIC as
    // the built-ins (to float tolerance) while being deterministic
    // under any partitioning (which the built-ins are not)
    val got = ops.Aggregates.aggCorrMoments(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ref = graft.ops.Util.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == ref.keySet)
    for ((k, (cv, r)) <- ref) {
      assert(math.abs(got(k)._1 - cv) / math.max(math.abs(cv), 1e-9) < 1e-6,
        s"$k covar: ${got(k)._1} vs $cv")
      assert(math.abs(got(k)._2 - r) < 1e-6, s"$k corr: ${got(k)._2} vs $r")
      assert(got(k)._2 >= -1.0 && got(k)._2 <= 1.0)
    }
    // repartition invariance: the decimal moments re-associate exactly
    // — the INPUT is repartitioned (repartitioning the 3-row output
    // would re-run the identical upstream plan and prove nothing)
    val li = graft.ops.Util.t(spark, sfDir, "lineitem")
    val got2 = ops.Aggregates.corrMoments(li.repartition(7)).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got2 == got)
    val got3 = ops.Aggregates.corrMoments(li.repartition(3, col("l_partkey")))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got3 == got)
  }

  test("D19: theta functions are SQL-callable via GraftExtensions") {
    graft.ops.Util.t(spark, sfDir, "orders").createOrReplaceTempView("t_ord")
    val row = spark.sql(
      """SELECT
        |  theta_estimate(theta_sketch_agg(o_custkey)) AS n,
        |  theta_set_estimate(
        |    theta_sketch_agg(CASE WHEN o_orderstatus = 'O' THEN o_custkey END),
        |    theta_sketch_agg(CASE WHEN o_orderstatus = 'F' THEN o_custkey END),
        |    'intersect') AS n_both
        |FROM t_ord""".stripMargin).collect()(0)
    val exact = graft.ops.Util.t(spark, sfDir, "orders")
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(row.getDouble(0) - exact) / exact <= 0.05)
    assert(row.getDouble(1) >= 0.0)
  }
  test("D21: histogram buckets partition the table; shares sum to 1") {
    val rows = graft.ops.Aggregates.aggHistogram(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = graft.ops.Util.t(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(3)).sum == total)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    // declared $5,000 bounds: lo = bucket*5000, hi = lo + 5000
    assert(rows.forall(r => r.getLong(1) == r.getLong(0) * 5000 &&
      r.getLong(2) == r.getLong(1) + 5000))
  }

  test("D23: equi-depth buckets partition the table, are ordered, and balance") {
    val rows = graft.ops.Aggregates.aggHistogramEqdepth(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L),
      "all 8 octile buckets occupied, in order")
    val total = graft.ops.Util.t(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    // buckets tile the value axis: max(bucket k) <= min(bucket k+1)
    for (w <- rows.sliding(2).filter(_.length == 2))
      assert(w(0).getLong(3) <= w(1).getLong(2),
        s"bucket value ranges overlap: ${w.mkString(" | ")}")
    // equi-DEPTH: every bucket within 2x of the ideal population (ties
    // on boundaries are the only imbalance source)
    val ideal = total / 8.0
    rows.foreach(r => assert(r.getLong(1) < 2 * ideal && r.getLong(1) > ideal / 2,
      s"bucket ${r.getLong(0)} holds ${r.getLong(1)} of ~$ideal"))
  }

  test("D13/D23 scale seam: the threshold switch is exact at the cap, " +
      "sketch above it") {
    import graft.ops.Aggregates._
    assert(useExactPercentile(0L))
    assert(useExactPercentile(ExactPercentileRowCap))
    assert(!useExactPercentile(ExactPercentileRowCap + 1))
    assert(useExactPercentile(10L, cap = 10L))
    assert(!useExactPercentile(11L, cap = 10L))
    // every fixture scale sits far under the default cap → the
    // registered queries always take the exact (oracle) path
    assert(useExactPercentile(
      graft.ops.Util.t(spark, sfDir.replace("0.001", "0.1"),
        "lineitem").count()))
  }

  test("D23 scale seam: the sketch path's buckets agree with the exact " +
      "path within the GK rank-error bound") {
    val total = graft.ops.Util.t(spark, sfDir, "lineitem").count()
    val exact = graft.ops.Aggregates
      .eqdepthHistogram(spark, sfDir, exact = Some(true)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Aggregates
      .eqdepthHistogram(spark, sfDir, exact = Some(false)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both paths partition the table
    assert(exact.values.sum == total)
    assert(approx.values.sum == total)
    // each approx boundary sits within rank error 1/accuracy = 0.1% of
    // its exact rank, so each bucket's population can shift by at most
    // 2 boundaries' error (plus interpolation-vs-observed-value slack
    // of one tied value run — bounded here by a small absolute floor)
    val tol = math.max(4.0, 2 * total / 1000.0)
    for (b <- 0L until 8L) {
      val e = exact.getOrElse(b, 0L)
      val a = approx.getOrElse(b, 0L)
      assert(math.abs(a - e) <= tol,
        s"bucket $b: approx $a vs exact $e exceeds rank-error tolerance $tol")
    }
  }

  test("D13 scale seam: the sketch path's group percentiles stay within " +
      "the rank-error bound of the exact path") {
    val exact = graft.ops.Aggregates
      .aggPercentileSeam(spark, sfDir, exact = Some(true)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.ops.Aggregates
      .aggPercentileSeam(spark, sfDir, exact = Some(false)).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet)
    val byGroup = graft.ops.Util.t(spark, sfDir, "orders")
      .select(org.apache.spark.sql.functions.col("o_orderstatus"),
        graft.ops.Util.cents(
          org.apache.spark.sql.functions.col("o_totalprice")).as("tpc"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).sorted }
    for ((k, (m, q1)) <- approx; (frac, v) <- Seq(0.5 -> m, 0.25 -> q1)) {
      val sorted = byGroup(k)
      val n = sorted.length
      // the sketch returns an OBSERVED value whose rank is within
      // n/accuracy of the target rank
      val target = frac * (n - 1)
      val slack = math.max(2.0, n / 1000.0 + 1)
      val lo = sorted(math.max(0, (target - slack).floor.toInt))
      val hi = sorted(math.min(n - 1, (target + slack).ceil.toInt))
      assert(v >= lo && v <= hi,
        s"group $k p$frac: sketch $v outside rank window [$lo, $hi]")
    }
  }

  test("D30 chi-square: dof/N exact, stat and effect size in range, " +
    "and a constructed independent table scores chi2 = 0") {
    val r = graft.ops.Aggregates.aggChiSquare(spark, sfDir).collect()(0)
    val (n, dof, chi2, v) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(n == graft.ops.Util.t(spark, sfDir, "orders").count())
    assert(dof >= 1 && chi2 >= 0.0)
    assert(v >= 0.0 && v <= 1.0, s"cramers_v $v outside [0,1]")
    // construction law: a perfectly independent 2x2 (counts r*c/N
    // exactly) must score chi2 = 0 via the same term pipeline
    import spark.implicits._
    val ind = Seq(("a", "x", 10), ("a", "y", 30), ("b", "x", 20),
      ("b", "y", 60)).flatMap { case (s0, p0, k) =>
        Seq.fill(k)((s0, p0)) }.toDF("seg", "pri")
    val obs = ind.groupBy("seg", "pri")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("o"))
    val e = obs.selectExpr("seg", "pri", "o",
      "sum(o) over (partition by seg) as r",
      "sum(o) over (partition by pri) as c",
      "sum(o) over () as n")
      .selectExpr("round(pow(o - (r*c)/cast(n as double), 2) / " +
        "((r*c)/cast(n as double)), 9) as term")
      .agg(org.apache.spark.sql.functions.sum("term")).collect()(0)
    assert(e.getDouble(0) == 0.0)
  }

  test("KS construction laws: identical classes D=0, disjoint D=1 (D31)") {
    import spark.implicits._
    val same = (1 to 50).flatMap(i => Seq(("F", i.toDouble), ("O", i.toDouble)))
      .toDF("s", "v").repartition(3)
    val r0 = graft.ops.Aggregates.ksCore(same, "F", "O").collect().head
    assert(r0.getAs[Long]("d_num") == 0L && r0.getAs[Double]("ks") == 0.0)
    val disj = ((1 to 30).map(i => ("F", i.toDouble)) ++
      (100 to 140).map(i => ("O", i.toDouble))).toDF("s", "v").repartition(3)
    val r1 = graft.ops.Aggregates.ksCore(disj, "F", "O").collect().head
    assert(r1.getAs[Double]("ks") == 1.0)
    // numerator identity at full separation: d_num = n_f * n_o
    assert(r1.getAs[Long]("d_num") ==
      r1.getAs[Long]("n_f") * r1.getAs[Long]("n_o"))
  }

  test("Gini construction laws: uniform 0, single-holder (n-1)/n (D32)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.DecimalType
    def holdings(xs: Seq[Double]) =
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("k", "raw")
        .select(col("k"), col("raw").cast(DecimalType(14, 2)).as("x"))
        .repartition(3)
    val uni = graft.ops.Aggregates.giniCore(holdings(Seq.fill(10)(5.0)))
      .collect().head
    assert(uni.getAs[Double]("gini") == 0.0)
    val single = graft.ops.Aggregates
      .giniCore(holdings(Seq.fill(9)(0.0) :+ 90.0)).collect().head
    assert(math.abs(single.getAs[Double]("gini") - 0.9) < 1e-12)
  }

  test("D37 percentile_disc follows the SQL-standard rule (smallest value " +
      "with cume_dist >= p), incl. the n=5 p=0.9 boundary") {
    import spark.implicits._
    // n=5: cume_dist = 0.2,0.4,0.6,0.8,1.0 → p=0.9 selects the 5th
    // element (standard rule); floor(p*(n-1)) = index 3 would give the
    // 4th — the exact divergence the oracle must NOT inherit from
    // quantile_disc.
    val out = Seq(10L, 20L, 30L, 40L, 50L).toDF("v").repartition(3)
      .agg(expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)")
        .cast("long").as("p90"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
          .cast("long").as("p50"))
      .collect().head
    assert(out.getAs[Long]("p90") == 50L,
      "standard rule picks the smallest v with cume_dist >= 0.9")
    assert(out.getAs[Long]("p50") == 30L)
    // discreteness: the result is an ACTUAL element even between ranks
    val mid = Seq(1L, 2L).toDF("v")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
        .cast("long")).collect().head.getLong(0)
    assert(mid == 1L, "no interpolation: cume_dist(1)=0.5 >= 0.5")
  }

  test("D38 winsorized mean: clamp bounds are data values; winsorized " +
      "mean is pulled toward the median under a planted outlier") {
    val out = graft.ops.Aggregates
      .aggWinsorizedMean(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      val (m, w) = (r.getAs[Double]("mean_cents"),
        r.getAs[Double]("winsor_mean_cents"))
      assert(lo <= hi)
      // the winsorized mean lives inside the clamp interval by law
      assert(w >= lo.toDouble && w <= hi.toDouble)
      // and cannot stray further from the interval than the raw mean's
      // clamp: |w - clamp(m)| bounded by interval width
      assert(math.abs(w - math.min(math.max(m, lo.toDouble), hi.toDouble))
        <= (hi - lo).toDouble)
    }
  }

  // ---- D41 Spearman rank correlation ----

  private def rho(rows: Seq[(String, Long, Long)]): Map[String, Double] = {
    import spark.implicits._
    ops.Aggregates.spearmanCore(
        rows.toDF("rf", "x", "y").repartition(3))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
  }

  test("D41: ρ(x,x) = 1 and ρ(x,−x) = −1, exactly") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val self = rho(xs.map(v => ("a", v, v)))
    val anti = rho(xs.map(v => ("a", v, -v)))
    assert(self("a") == 1.0)
    assert(anti("a") == -1.0)
  }

  test("D41: monotone transform of either variable leaves ρ unchanged") {
    val pairs = Seq((3L, 7L), (1L, 2L), (4L, 9L), (1L, 2L), (5L, 1L),
      (9L, 4L), (2L, 8L), (6L, 3L))
    val base = rho(pairs.map { case (x, y) => ("a", x, y) })
    val scaled = rho(pairs.map { case (x, y) => ("a", x * 100L, y * 7L + 3L) })
    assert(base("a") == scaled("a"),
      "ranks see order, not magnitude — ρ must be transform-invariant")
  }

  test("D41: ties get averaged ranks (all-equal x ⇒ degenerate NULL ρ)") {
    import spark.implicits._
    val out = ops.Aggregates.spearmanCore(
      Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L))
        .toDF("rf", "x", "y"))
      .collect()
    // zero x-variance ⇒ the denominator is 0 ⇒ NULL (never a crash
    // and never a fabricated 0)
    assert(out.length == 1 && out.head.isNullAt(2))
  }

  test("D41: the fixture query is deterministic under repartitioning") {
    val a = ops.Aggregates.aggSpearman(spark, sfDir).collect().toSeq
    val b = ops.Aggregates.aggSpearman(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  // ---- D42 KLL mergeable quantile sketch ----

  test("D42: every KLL quantile estimate sits within the rank-error contract") {
    // exact per-flag sorted cents as the ground truth
    val exact = graft.ops.Util.t(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("rf"),
        graft.ops.Util.cents(col("l_extendedprice")).as("c"))
      .collect().groupBy(_.getString(0))
      .map { case (rf, rs) => rf -> rs.map(_.getLong(1)).sorted }
    val out = ops.Aggregates.aggSketchKll(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out; (p, i) <- Seq(0.5 -> 2, 0.9 -> 3, 0.99 -> 4)) {
      val vs = exact(r.getString(0))
      val est = r.getDouble(i)
      // normalized rank of the estimate vs the requested rank: k=200
      // guarantees ~1.65% (99% two-sided); 4% = a generous 2+ epsilon
      // band that still catches a broken merge outright
      val rank = vs.count(_ <= est).toDouble / vs.length
      assert(math.abs(rank - p) <= 0.04,
        s"rf=${r.getString(0)} p=$p est=$est rank=$rank")
    }
  }

  test("D42: the sketch merges across partitionings within the same contract") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.functions.{KllQuantile, KllSketchAgg}
    val n = 20000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(13)
    val est = df
      .agg(column(KllSketchAgg(expression(col("v")))
        .toAggregateExpression()).as("sk"))
      .select(column(KllQuantile(expression(col("sk")),
        expression(lit(0.5)))).as("p50"))
      .collect().head.getDouble(0)
    assert(math.abs(est / n - 0.5) <= 0.04, s"p50 of 1..$n was $est")
  }

  // ---- D43 categorical group entropy ----

  test("D43: uniform mix normalizes to 1, a single category to 0/NULL") {
    import spark.implicits._
    val rows =
      (1 to 40).map(i => ("uniform", s"p${i % 4}")) ++
      (1 to 40).map(_ => ("single", "only")) ++
      ((1 to 30).map(_ => ("skewed", "dominant")) ++
        (1 to 2).map(i => ("skewed", s"rare$i")))
    val out = ops.Aggregates.groupEntropyCore(
        rows.toDF("s", "pri").repartition(5))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    val (uk, ubits, unorm) = out("uniform")
    assert(uk == 4L && unorm.contains(1.0),
      s"4-way uniform must normalize to exactly 1, got $unorm")
    assert(ubits.exists(b => math.abs(b - 2.0) < 1e-9),
      "4-way uniform is exactly 2 bits")
    val (sk1, sbits, snorm) = out("single")
    assert(sk1 == 1L && sbits.exists(b => math.abs(b) < 1e-9)
        && snorm.isEmpty,
      "one category: zero entropy, undefined normalization")
    val (_, kbits, knorm) = out("skewed")
    assert(kbits.exists(_ > 0.0) && knorm.exists(n => n > 0.0 && n < 1.0))
  }

  test("D43: the fixture query is deterministic and in range") {
    val a = ops.Aggregates.aggGroupEntropy(spark, sfDir).collect().toSeq
    val b = ops.Aggregates.aggGroupEntropy(spark, sfDir).collect().toSeq
    assert(a == b && a.nonEmpty)
    a.filter(!_.isNullAt(4)).foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("D42: the SQL surface accepts plain literals and DECIMAL inputs") {
    graft.ops.Util.t(spark, sfDir, "lineitem")
      .createOrReplaceTempView("kll_li")
    // the documented usage: a bare 0.5 literal (parsed DECIMAL(1,1) —
    // must implicitly coerce) over a DECIMAL-cast money column (must
    // sketch without an execution-time type error)
    val est = spark.sql(
      """SELECT kll_quantile(
        |  kll_sketch_agg(CAST(l_extendedprice AS DECIMAL(18,4))), 0.5)
        |  AS p50
        |FROM kll_li""".stripMargin).collect().head.getDouble(0)
    assert(est > 0.0)
  }

}
