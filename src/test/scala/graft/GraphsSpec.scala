package graft

import graft.ops.Graphs
import org.apache.spark.sql.DataFrame

/** Pins the triangle-census core on graphs with known closed-form
  * answers (the oracle pins the fixture co-occurrence graph; these pin
  * the algorithm — degree orientation, wedge closure, each triangle
  * counted exactly once). */
class GraphsSpec extends SparkTestBase {

  private def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Option[Double]) = {
    import spark.implicits._
    val df: DataFrame = edges.toDF("u", "v")
    val r = Graphs.triangleCensus(df).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("K4 complete graph: 4 triangles, clustering 1.0") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val (n, m, w, t, c) = census(k4)
    assert(n == 4 && m == 6 && w == 12 && t == 4)
    assert(c.contains(1.0))
  }

  test("path graph has wedges but no triangles") {
    val (n, m, w, t, c) = census(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(n == 4 && m == 3 && w == 2 && t == 0)
    assert(c.contains(0.0))
  }

  test("star graph: hub wedges, zero triangles (orientation bounds the hub)") {
    val star = (2L to 9L).map(i => (1L, i))
    val (n, m, w, t, _) = census(star)
    assert(n == 9 && m == 8 && w == 28 && t == 0)
  }

  test("single edge: no wedges, clustering NULL") {
    val (n, m, w, t, c) = census(Seq((1L, 2L)))
    assert(n == 2 && m == 1 && w == 0 && t == 0)
    assert(c.isEmpty)
  }

  test("clustering coefficient buckets on known graphs (L10)") {
    import spark.implicits._
    // K4: every node degree 3 (bucket 1), each in all 4 triangles:
    // tri_sum = 12, wedges = 4·(3·2/2) = 12 → coeff exactly 1.0
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("u", "v")
    val rk4 = Graphs.clusteringByDegreeBucket(k4).collect()
    assert(rk4.length == 1 && rk4(0).getLong(0) == 1)
    assert(rk4(0).getLong(2) == 12 && rk4(0).getLong(3) == 12)
    assert(rk4(0).getDouble(4) == 1.0)
    // star: hub bucket has wedges but zero triangles → 0.0; leaves
    // (degree 1) have zero wedges → NULL coeff
    val star = (2L to 9L).map(i => (1L, i)).toDF("u", "v")
    val rs = Graphs.clusteringByDegreeBucket(star).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(rs(0L) == ((0L, 0L, None)), "degree-1 leaves: no wedges, NULL")
    assert(rs(3L) == ((0L, 28L, Some(0.0))), "the degree-8 hub closes nothing")
  }

  test("two triangles sharing an edge (bowtie-ish): exact count 2") {
    // {1,2,3} and {2,3,4} share edge (2,3)
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (_, m, _, t, _) = census(g)
    assert(m == 5 && t == 2)
  }

  test("pagerank conserves mass and ranks the hub first (L2)") {
    val out = Graphs.graphPagerank(spark, sfDir).collect()
    assert(out.length == 20)
    // rank order is (rank DESC, node) and all ranks positive
    val ranks = out.map(_.getDouble(2))
    assert(ranks.forall(_ > 0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // degree and rank correlate on a co-occurrence graph: the top-20
    // by rank should carry above-average degree
    val meanTopDeg = out.map(_.getLong(1)).sum.toDouble / out.length
    val edges = Graphs.coOccurrenceEdges(spark, sfDir)
    val meanDeg = 2.0 * edges.count() /
      edges.select("u").union(edges.select("v")).distinct().count()
    assert(meanTopDeg > meanDeg,
      s"top-20 mean degree $meanTopDeg should exceed corpus mean $meanDeg")
  }

  test("pagerank on a regular graph is exactly uniform (L2)") {
    // uniform is the stationary distribution of any regular graph; the
    // 12 dp term rounding computes the identical value per node at
    // every step, so after any number of iterations ranks stay equal
    import spark.implicits._
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val r = Graphs.pagerank(tri).collect()
    assert(r.length == 3)
    assert(r.map(_.getDouble(2)).distinct.length == 1)
    assert(math.abs(r.map(_.getDouble(2)).sum - 1.0) < 1e-9)
  }

  test("pagerank mass is conserved and the star hub dominates (L2)") {
    import spark.implicits._
    val star = (2L to 9L).map(i => (1L, i)).toDF("u", "v")
    val r = Graphs.pagerank(star).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // no dangling nodes on a symmetric graph → total rank stays 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // the hub absorbs every leaf's full contribution each round
    assert(r(1L) > 0.4)
    val leaves = (2L to 9L).map(r)
    assert(leaves.forall(l => math.abs(l - leaves.head) < 1e-12))
    assert(leaves.forall(_ < r(1L)))
  }

  test("neighborhood similarity on known graphs (L3)") {
    import spark.implicits._
    // path 1-2-3: nodes 1 and 3 share neighbor 2, J = 1/(1+1-1) = 1.0;
    // pairs (1,2) and (2,3) share no neighbor → absent
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val p = Graphs.neighborhoodSimilar(path).collect()
    assert(p.length == 1)
    assert(p(0).getLong(0) == 1L && p(0).getLong(1) == 3L &&
      p(0).getLong(2) == 1L && p(0).getDouble(3) == 1.0)
    // K4: every pair is adjacent AND shares the other 2 nodes:
    // J = 2/(3+3-2) = 0.5 for all 6 pairs
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toDF("u", "v")
    val s = Graphs.neighborhoodSimilar(k4).collect()
    assert(s.length == 6)
    assert(s.forall(r => r.getLong(2) == 2L && r.getDouble(3) == 0.5))
  }

  test("graph_similar output is ranked, bounded, canonical (L3)") {
    val out = Graphs.graphSimilar(spark, sfDir).collect()
    assert(out.length == 20)
    val js = out.map(_.getDouble(3))
    assert(js.forall(j => j > 0 && j <= 1.0))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b })
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("planted hub: neighbor cap bounds the wedge expansion (L3)") {
    import spark.implicits._
    // star 1-(2..10): hub degree 9. Uncapped, the hub alone expands
    // C(9,2) = 36 wedge pairs; with cap 4 only its 4 smallest
    // neighbors {2,3,4,5} expand → C(4,2) = 6 pairs. Leaves have a
    // single neighbor and never pair. Denominators keep FULL degrees:
    // leaf pair jaccard = 1/(1+1-1) = 1.0 either way.
    val star = (2L to 10L).map(i => (1L, i)).toDF("u", "v")
    val uncapped = Graphs.neighborhoodSimilar(star).collect()
    assert(uncapped.length == 36)
    val capped = Graphs.neighborhoodSimilar(star, cap = 4).collect()
    assert(capped.length == 6)
    assert(capped.forall(r => Set(2L, 3L, 4L, 5L)(r.getLong(0)) &&
      Set(2L, 3L, 4L, 5L)(r.getLong(1))))
    assert(capped.forall(r => r.getLong(2) == 1L && r.getDouble(3) == 1.0))
    // the truncation is OBSERVABLE, not silent: the shared bucket
    // machinery reports exactly the members the cap dropped
    val sym = star.select($"u".as("src"), $"v".as("dst"))
      .unionAll(star.select($"v".as("src"), $"u".as("dst")))
    val buckets = graft.ops.Buckets.members(
      sym, Seq("src"), $"dst", $"dst", cap = 4)
    assert(graft.ops.Buckets.overflowTotal(buckets) == 5L) // 9 - 4
  }

  test("planted hub: degree orientation bounds out-degree at O(√m) (L1)") {
    import spark.implicits._
    // star 1-(2..51): hub degree 50, m = 50. A naive neighbor
    // self-join would materialize C(50,2) = 1225 hub wedges; the
    // orientation directs every edge leaf→hub (leaves have the lower
    // degree), so max out-degree is 1 and the wedge join sees ZERO
    // canonically-ordered out-pairs.
    val star = (2L to 51L).map(i => (1L, i)).toDF("u", "v")
    val deg = star.select($"u".as("node")).unionAll(star.select($"v".as("node")))
      .groupBy($"node").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("d"))
    val fwd = Graphs.orientLowHigh(star, deg)
    val outDeg = fwd.groupBy($"x").count().collect()
    assert(outDeg.forall(_.getLong(1) == 1L))
    val m = star.count()
    val bound = math.ceil(math.sqrt(2.0 * m)).toLong
    assert(outDeg.forall(_.getLong(1) <= bound))
    // and the full census on the hub graph stays linear-shaped: the
    // wedge count reflects the UNDIRECTED graph (C(50,2)) while the
    // oriented join that actually executes closes 0 triangles
    val r = Graphs.triangleCensus(star).collect()(0)
    assert(r.getLong(2) == 1225L && r.getLong(3) == 0L)
  }

  test("graph_health reports zero truncation on the fixture (L3)") {
    val h = Graphs.graphSimilarHealth(spark, sfDir).collect()(0)
    val (n, m) = (h.getLong(0), h.getLong(1))
    assert(n > 0 && m > 0)
    val edges = Graphs.coOccurrenceEdges(spark, sfDir, minQty = 35)
    assert(m == edges.count())
    assert(n == edges.select("u").union(edges.select("v")).distinct().count())
    assert(h.getLong(2) <= graft.ops.Buckets.MaxBucket,
      "fixture max degree must sit under the cap")
    assert(h.getLong(3) == 0L && h.getLong(4) == 0L)
  }

  test("cached edge list is row-identical to the lazy construction") {
    for (q <- Seq(25, 35)) {
      val lazily = Graphs.coOccurrenceEdges(spark, sfDir, q).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val cached = Graphs.cachedCoOccurrenceEdges(spark, sfDir, q).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cached == lazily, s"minQty=$q cached edges diverge")
      assert(cached.nonEmpty)
    }
  }

  test("fixture co-occurrence census is internally consistent") {
    val r = Graphs.graphTriangles(spark, sfDir).collect()(0)
    val (n, m, w, t) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0 && m > 0)
    // every triangle closes 3 wedges; 3T never exceeds the wedge count
    assert(3 * t <= w)
    // m ≤ C(n,2); w ≤ m·(max possible shared endpoint degree) sanity
    assert(m <= n * (n - 1) / 2)
  }

  test("graph_components labels the support-48 backbone into many small components (L4)") {
    val rows = Graphs.graphComponents(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val comps = rows.groupBy(_.getLong(1))
    // the POINT of the tighter cut: not one giant component
    assert(comps.size > 1)
    for ((cid, rs) <- comps) {
      // declared size matches the actual member count
      assert(rs.forall(_.getLong(2) == rs.length))
      // the label is the component's minimum member id
      assert(rs.map(_.getLong(0)).min == cid)
    }
  }

  test("L5: degree distribution tiles power-of-two spans and conserves mass") {
    import graft.ops.Graphs
    val rows = Graphs.graphDegreeDist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (b, minD, maxD) = (r.getLong(0), r.getLong(2), r.getLong(3))
      // bucket b holds exactly degrees in [2^b, 2^(b+1))
      assert(minD >= (1L << b) && maxD < (1L << (b + 1)),
        s"bucket $b observed [$minD, $maxD]")
      assert(minD <= maxD && r.getLong(1) >= 1)
    }
    // Σ deg over buckets == 2 · |E| (handshake), nodes conserve
    val e = Graphs.coOccurrenceEdges(spark, sfDir)
    assert(rows.map(_.getLong(4)).sum == 2L * e.count())
    val nNodes = e.select(org.apache.spark.sql.functions.col("u").as("n"))
      .union(e.select(org.apache.spark.sql.functions.col("v").as("n")))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum == nNodes)
  }

  test("L7: LPA collapses disconnected cliques to independent communities") {
    import spark.implicits._
    val twoCliques = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("u", "v")
    val lbl = Graphs.labelPropagation(twoCliques).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to ONE label; parts never cross-talk
    assert(Set(lbl(0L), lbl(1L), lbl(2L)).size == 1)
    assert(Set(lbl(10L), lbl(11L), lbl(12L)).size == 1)
    assert(lbl(0L) != lbl(10L))
    assert(Set(0L, 1L, 2L).contains(lbl(0L)) &&
      Set(10L, 11L, 12L).contains(lbl(10L)))
  }

  test("L7: fixture communities are consistent (graph_label_prop)") {
    val rows = Graphs.graphLabelProp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val comms = rows.groupBy(_._2)
    assert(comms.size > 1, "not one giant community on the sparse cut")
    val nodes = rows.map(_._1).toSet
    for ((c, rs) <- comms) {
      assert(rs.forall(_._3 == rs.length), s"declared size wrong for $c")
      // labels originate as node ids and only ever propagate — every
      // surviving label must be a node of the graph
      assert(nodes.contains(c), s"label $c is not a graph node")
    }
  }

  test("L8: peel keeps a K4 clique intact and annihilates a path") {
    import spark.implicits._
    // K4 is its own 3-core: nobody ever drops below degree 3
    val k4 = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L)).toDF("u", "v")
    val kept = Graphs.kcorePeel(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a path has max degree 2 — one round erases it entirely
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("u", "v")
    assert(Graphs.kcorePeel(path).count() == 0)
    // peeling CASCADES: a K4 with a pendant chain loses the chain in
    // successive rounds but the clique survives untouched
    val pendant = k4.unionAll(Seq((3L, 10L), (10L, 11L)).toDF("u", "v"))
    val kept2 = Graphs.kcorePeel(pendant).collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(0L, 1L, 2L, 3L))
  }

  test("L8: the bounded peel never removes a true 3-core member (graph_kcore)") {
    val rows = Graphs.graphKcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty, "the support-25 graph has a 3-round 3-core")
    // peeling is MONOTONE: each round removes only nodes the exact
    // core also excludes, so after any number of rounds the survivors
    // are a SUPERSET of the true k-core (they converge from above) —
    // compute the exact core by peeling to fixpoint on the driver
    var es = Graphs.cachedCoOccurrenceEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var changed = true
    while (changed) {
      val deg = (es.map(_._1) ++ es.map(_._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.length }
      val keep = deg.filter(_._2 >= Graphs.KcoreK).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.length != es.length
      es = next
    }
    val exactCore = (es.map(_._1) ++ es.map(_._2)).toSet
    assert(exactCore.subsetOf(rows.keySet),
      "a true core member was peeled — the bound must converge from above")
  }

  test("L6/L7/L8: randomized differential vs plain-Scala references") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814)
    for (trial <- 1 to 3) {
      val n = 12 + trial * 6
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n if rnd.nextDouble() < 0.18
      } yield (u, v)).toVector
      if (edges.nonEmpty) {
        val df = edges.toDF("u", "v")
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2).toSet }
        val nodes = adj.keySet

        // BFS reference from MIN(node), capped at BfsMaxHops
        val src = nodes.min
        var dist = Map(src -> 0)
        var frontier = Set(src)
        for (d <- 1 to Graphs.BfsMaxHops) {
          frontier = frontier.flatMap(adj).diff(dist.keySet)
          dist ++= frontier.map(_ -> d)
        }
        val gotB = Graphs.bfsDistances(df).collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
        assert(gotB == dist, s"BFS diverges on trial $trial")

        // LPA reference: synchronous, mode-of-neighbors, tie -> min
        var lbl: Map[Long, Long] = nodes.map(x => x -> x).toMap
        for (_ <- 1 to Graphs.LpaRounds)
          lbl = nodes.map { v =>
            val counts = adj(v).toSeq.map(lbl).groupBy(identity)
              .map { case (l, xs) => l -> xs.length }
            v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
          }.toMap
        val gotL = Graphs.labelPropagation(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotL == lbl, s"LPA diverges on trial $trial")

        // k-core reference: KcoreRounds synchronous peel rounds
        var es = edges
        for (_ <- 1 to Graphs.KcoreRounds) {
          val deg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
            .map { case (k, xs) => k -> xs.length }
          val keep = deg.filter(_._2 >= Graphs.KcoreK).keySet
          es = es.filter(e => keep(e._1) && keep(e._2))
        }
        val refDeg = (es.map(_._1) ++ es.map(_._2)).groupBy(identity)
          .map { case (k, xs) => k -> xs.length.toLong }
        val gotK = Graphs.kcorePeel(df).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotK == refDeg, s"k-core diverges on trial $trial")
      }
    }
  }

  test("L6: BFS distances are exact on a path and capped at BfsMaxHops") {
    import spark.implicits._
    // path 0-1-2-...-9 from seed MIN=0: dist(i)=i, capped at 6 hops —
    // nodes 7..9 are beyond the declared depth and must be ABSENT
    val path = (0L until 9L).map(i => (i, i + 1)).toDF("u", "v")
    val d = Graphs.bfsDistances(path).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == (0 to Graphs.BfsMaxHops).map(i => i.toLong -> i).toMap)
  }

  test("L6: BFS on a cycle takes the shorter way around") {
    import spark.implicits._
    // 6-cycle 0-1-2-3-4-5-0: two directions meet at node 3
    val cycle = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 0L)).toDF("u", "v")
    val d = Graphs.bfsDistances(cycle).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 5L -> 1, 2L -> 2, 4L -> 2, 3L -> 3))
  }

  test("L6: fixture BFS — seed at dist 0, frontier monotone (graph_bfs)") {
    val rows = Graphs.graphBfs(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    assert(rows.nonEmpty)
    val byNode = rows.toMap
    assert(byNode(rows.map(_._1).min) == 0, "seed is MIN(node) at dist 0")
    assert(rows.count(_._2 == 0) == 1, "exactly one seed")
    assert(rows.forall { case (_, d) => d >= 0 && d <= Graphs.BfsMaxHops })
    // every reached non-seed node has a neighbor one hop closer
    val edges = Graphs.cachedCoOccurrenceEdges(spark, sfDir,
      Graphs.ComponentsMinQty).collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    for ((n, d) <- rows if d > 0)
      assert(nbrs(n).exists(m => byNode.get(m).contains(d - 1)),
        s"node $n at dist $d has no parent at ${d - 1}")
  }

  test("L9 modularity laws: two disjoint triangles labeled apart give " +
      "Q = 1/2; one community gives Q = 0") {
    import spark.implicits._
    val tri2 = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("u", "v")
    // the natural partition: each triangle its own community
    val apart = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "lbl")
    val q1 = graft.ops.Graphs.modularity(tri2, apart).collect()(0)
    assert(q1.getLong(0) == 2L && q1.getLong(1) == 6L &&
      q1.getLong(2) == 6L)
    assert(q1.getDouble(3) == 0.5,
      s"two separated triangles must score Q = 1/2, got $q1")
    // the degenerate partition: everything in one community → Q = 0
    val together = (1L to 6L).map(i => (i, 1L)).toDF("id", "lbl")
    val q0 = graft.ops.Graphs.modularity(tri2, together).collect()(0)
    assert(q0.getDouble(3) == 0.0, s"one community must score 0, got $q0")
    // LPA's own labels on this graph collapse each triangle — the
    // registered composition reproduces the law end-to-end
    val lpa = graft.ops.Graphs.modularity(tri2,
      graft.ops.Graphs.labelPropagation(tri2)).collect()(0)
    assert(lpa.getDouble(3) == 0.5)
  }

  test("L12 HITS: the anchor part out-ranks the periphery, the " +
    "broad buyer out-hubs the narrow one, and each role is L1-normal") {
    import spark.implicits._
    // customers 1,2 both buy part 10 (the anchor); customer 1 also
    // buys 11-13 (broad hub); customer 2 adds 12 (so 10's buyer set
    // carries more hub mass than 11's — without it (10,2)↔(11,3) is
    // a graph automorphism and the two authorities tie forever);
    // customer 3 buys only part 11
    val edges = Seq(1L -> 10L, 2L -> 10L, 2L -> 12L, 1L -> 11L,
      1L -> 12L, 1L -> 13L, 3L -> 11L).toDF("c", "p")
    val rows = graft.ops.Graphs.hits(edges).collect()
    val auth = rows.filter(_.getString(0) == "authority")
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val hub = rows.filter(_.getString(0) == "hub")
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // mutual reinforcement: 10 and 12 share the identical buyer set
    // {1,2} so their authorities are EQUAL (permutation invariance);
    // both beat 11 (buyers {1,3} — 3 is a weaker hub than 2), and 11
    // beats the single-buyer 13
    assert(auth(10L) == auth(12L))
    assert(auth(10L) > auth(11L) && auth(11L) > auth(13L))
    // hubs: the 4-part buyer beats the 2-part buyer beats the
    // single-part buyer
    assert(hub(1L) > hub(2L) && hub(2L) > hub(3L))
    for (m <- Seq(auth, hub))
      assert(math.abs(m.values.sum - 1.0) < 1e-6,
        s"role mass ${m.values.sum} != 1")
  }
  test("cached HITS edges are row-identical to the lazy derivation (L12)") {
    val lazyE = graft.ops.Graphs.hitsEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cached = graft.ops.Graphs.cachedHitsEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cached == lazyE)
    assert(cached.nonEmpty)
  }

  test("reliable-checkpoint switch: EVERY iterative op through a " +
      "checkpoint dir is row-identical to the localCheckpoint path " +
      "(r16 verdict #5, extended to the full family in r17 #5)") {
    // all six iterative graph ops route their lineage cuts through
    // Util.iterCheckpoint; the conf switch must change durability, not
    // results. Row snapshots are compared as canonical string sets so
    // one loop covers heterogeneous schemas.
    val iterativeOps = Seq("graph_pagerank", "graph_hits",
      "graph_label_prop", "graph_kcore", "graph_bfs", "graph_components")
    def snap(name: String): Map[String, Set[String]] = Map(
      name -> SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet)
    val localOut = iterativeOps.map(snap).reduce(_ ++ _)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-reliable-ckpt").toString
    try {
      spark.conf.set(graft.ops.Util.CheckpointDirConf, dir)
      for (op <- iterativeOps) {
        val reliableOut = snap(op)(op)
        assert(reliableOut == localOut(op),
          s"$op: reliable and local checkpoint paths must produce " +
            "identical rows")
      }
      // the switch actually wrote through the filesystem (label-cached
      // ops may serve their fixpoint from FixtureCache, but the
      // per-query iterative ops checkpoint every round)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, s"no checkpoint files under $dir — switch inert")
    } finally {
      spark.conf.unset(graft.ops.Util.CheckpointDirConf)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  // ---- L14 reciprocity / dyad census ----

  test("L14: known dyad census — one mutual pair, two one-way edges") {
    import spark.implicits._
    // 1⇄2 mutual; 2→3 and 3→4 one-way
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst").repartition(3)
    val r = Graphs.reciprocityCensus(edges).collect().head
    assert(r.getLong(0) == 4L)              // nodes
    assert(r.getLong(1) == 4L)              // edges
    assert(r.getLong(2) == 2L)              // reciprocated directed edges
    assert(r.getLong(3) == 1L)              // mutual pairs
    assert(r.getLong(4) == 2L)              // asymmetric
    assert(r.getDouble(5) == 0.5)
  }

  test("L14: a fully symmetric digraph has reciprocity exactly 1") {
    import spark.implicits._
    val oneWay = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val edges = (oneWay ++ oneWay.map(_.swap)).toDF("src", "dst")
    val r = Graphs.reciprocityCensus(edges).collect().head
    assert(r.getDouble(5) == 1.0)
    assert(r.getLong(4) == 0L, "no asymmetric edges in a symmetric graph")
  }

  test("L14: the fixture census is internally consistent") {
    val r = Graphs.graphReciprocity(spark, sfDir).collect().head
    val (e, recip, mutual, asym) =
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(recip % 2 == 0, "reciprocated edges pair up")
    assert(mutual == recip / 2)
    assert(asym == e - recip)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

}
