package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Util._

/** Graph analytics over warehouse-shaped co-occurrence data — the
  * engine's graph rung beside the dedup family's connected components
  * ([[graft.ops.Components]]). The fixture graph: parts are nodes, two
  * parts share an undirected edge when some order contains both
  * (market-basket co-occurrence — the same construction a link-graph
  * or co-citation pipeline uses).
  *
  * Scale notes: edge generation groups by order key with the shared
  * skew-capped [[Buckets.members]] (TPC-H orders hold ≤ 7 lineitems,
  * but the cap makes a degenerate mega-order bounded instead of
  * quadratic). Triangle counting uses the DEGREE-ORIENTATION algorithm:
  * every edge is directed from its lower-(degree, id) endpoint to the
  * higher, which bounds each node's out-degree by O(√m), so the wedge
  * join materializes Σ C(outdeg, 2) = O(m^1.5) rows worst case instead
  * of the Σ C(deg, 2) a naive neighbor self-join pays on skewed
  * degrees (the hub node that melts a 100-TB run). The wedge self-join
  * reads the same oriented-edge subplan twice — identical exchanges,
  * which Spark's ReuseExchange collapses to one shuffle write.
  */
object Graphs {

  /** Triangle census: nodes, edges, wedges (open two-paths), exact
    * triangle count, and the global clustering coefficient
    * 3·T / wedges — all integer arithmetic except the one final
    * exact-decimal ratio. One row. */
  def graphTriangles(spark: SparkSession, sfDir: String): DataFrame =
    triangleCensus(cachedCoOccurrenceEdges(spark, sfDir))

  /** The edge construction, lazy and uncheckpointed — separated so the
    * scan-level pushdown of the support filter stays auditable
    * (`PlanAuditSpec`; [[triangleCensus]]'s eager checkpoint truncates
    * lineage, hiding the scan from the census plan).
    *
    * Significant positions only (quantity ≥ 25, pushed to the scan):
    * co-occurrence pair counts grow quadratically in positions per
    * order, so the filter cuts the wedge volume ~14× while leaving a
    * rich graph at every fixture scale — the same basket-support
    * pruning a market-basket pipeline applies before pair expansion. */
  def coOccurrenceEdges(spark: SparkSession, sfDir: String,
      minQty: Int = 25): DataFrame = {
    val pn = t(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= minQty)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("node"))
      .distinct()
    Buckets.members(pn, Seq("okey"), col("node"), col("node"))
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("u"), col("p.b").as("v"))
      .distinct()
  }

  /** The materialized edge list, built ONCE per (fixture content,
    * support cut) through the shared [[FixtureCache]] discipline (the
    * A9 bucketed-table / K18 IVF-index pattern): every graph query
    * reads the committed parquet instead of re-deriving the
    * scan→distinct→bucket→pair expansion per execution. This is what a
    * production pipeline does — the graph is built in one pass and
    * persisted; triangles, pagerank, and similarity all consume the
    * same artifact. Cold build = exactly [[coOccurrenceEdges]] (the
    * support filter reaches the lineitem scan there — audited in
    * `PlanAuditSpec`); warm reads are a 2-column parquet scan. */
  def cachedCoOccurrenceEdges(spark: SparkSession, sfDir: String,
      minQty: Int = 25): DataFrame = {
    // the cache NAME carries every input the fixture content key can't
    // see: the support cut, the bucket cap, and a logic version to
    // bump whenever the edge derivation itself changes — otherwise a
    // warm host silently serves edges built by OLD code (the content
    // key only tracks the parquet's name/len/mtime)
    val tag = s"cograph_q${minQty}_b${Buckets.MaxBucket}_$EdgeCacheVersion"
    val dir = FixtureCache.ensure(spark, tag, sfDir,
      Seq(s"$sfDir/lineitem.parquet")) { staging =>
      coOccurrenceEdges(spark, sfDir, minQty)
        .write.mode("overwrite").parquet(s"$staging/edges.parquet")
    }
    spark.read.parquet(s"$dir/edges.parquet")
  }

  /** Bump on ANY semantic change to [[coOccurrenceEdges]] — part of
    * the cache identity above. */
  private val EdgeCacheVersion = "v1"

  /** Fixed iteration count for [[graphPagerank]] — part of the query's
    * declared semantics (the oracle unrolls exactly this many steps). */
  val PagerankIters = 5

  /** L2: PageRank centrality over the same co-occurrence graph — the
    * importance propagation a corpus-curation pipeline runs over its
    * host/link graph to rank sources (the public harmonic-centrality /
    * PageRank selection idea); here over parts, top-20 by rank.
    *
    * Deterministic and oracle-checkable despite float arithmetic: each
    * edge contribution rank/deg is rounded to 12 dp and summed as
    * EXACT DECIMAL (associative — a raw double sum would hash-flap
    * with shuffle order; the `text_entropy` discipline), then one IEEE
    * multiply-add and a 12 dp re-round per node per iteration, so both
    * engines walk the identical float sequence. Fixed
    * [[PagerankIters]] iterations, damping 0.85. The symmetric graph
    * has no dangling nodes (every node has in-edges), so no dangling
    * redistribution term is needed.
    *
    * Scale shape: each iteration is one co-partitioned join of the
    * (src-keyed) edge list with the rank frame plus one partial-agg
    * shuffle on dst — the rank frame is node-cardinality, never
    * broadcast-hinted. Every iteration ends in an eager
    * `localCheckpoint` (the [[Components]] discipline): iterative
    * plans otherwise nest five joins deep and the optimizer re-derives
    * the whole lineage per step. */
  def graphPagerank(spark: SparkSession, sfDir: String): DataFrame =
    pagerank(cachedCoOccurrenceEdges(spark, sfDir))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)

  /** The PageRank core over an arbitrary distinct undirected (u, v)
    * edge list: full (node, d, rank) table after [[PagerankIters]]
    * damped iterations — separated so the propagation laws (mass
    * conservation, uniform stationary distribution on regular graphs)
    * are pinnable on known graphs (`GraphsSpec`). */
  def pagerank(rawEdges: DataFrame): DataFrame = {
    val edges = rawEdges.iterCheckpoint()
    // NOT checkpointed: a narrow projection-union over the already-
    // checkpointed edges — materializing it would only copy the rows
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .iterCheckpoint()
    // the teleport denominator n stays IN the dataflow as a 1-row
    // broadcast frame instead of a driver-side deg.count() (round-11
    // verdict #4): the scalar never round-trips through the driver.
    // Materialized ONCE alongside the deg checkpoint so each
    // iteration broadcasts a cached single row instead of re-deriving
    // the agg in its plan. Measured at sf0.1: parity with the old
    // driver-side count (6.3 s median either way) — the fold costs
    // nothing and removes the pre-iteration action. The broadcast
    // hint is the bounded-single-row pattern (Events.scala totals
    // frame): always exactly 1 row.
    val nF = broadcast(deg.agg(count(lit(1)).cast("double").as("n_nodes"))
      .iterCheckpoint())
    // fold the out-degree onto each edge ONCE, and hash-partition the
    // edge list on the iteration join key BEFORE checkpointing: a
    // LogicalRDD keeps its physical partitioning, so every iteration's
    // join sees the edge side pre-shuffled and exchanges only the
    // node-cardinality rank frame — the Pregel partition-once
    // discipline, and the difference between shuffling the 100-TB edge
    // list once vs once per iteration
    val symd = sym.join(deg, Seq("src"))
      .repartition(col("src")).iterCheckpoint()
    val DL = DecimalType(28, 14)
    var ranks = deg.crossJoin(nF).select(col("src").as("node"),
      round(lit(1.0) / col("n_nodes"), 12).as("rank"))
    for (_ <- 1 to PagerankIters) {
      ranks = symd
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), round(col("rank") / col("d"), 12).as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c").cast(DL)).as("sc"))
        .crossJoin(nF)
        .select(col("dst").as("node"),
          round(lit(0.15) / col("n_nodes")
            + lit(0.85) * col("sc").cast("double"), 12).as("rank"))
        .iterCheckpoint()
    }
    ranks.join(deg.withColumnRenamed("src", "node"), Seq("node"))
      .select(col("node"), col("d"), col("rank"))
  }

  /** L3: neighborhood-similarity — the link-prediction / related-items
    * primitive: for part pairs sharing at least one co-occurrence
    * neighbor, the Jaccard of their neighbor sets
    * |N(a)∩N(b)| / |N(a)∪N(b)|, top-20 (the "parts bought alongside
    * the same parts" view, distinct from a direct co-occurrence edge).
    * Built on a tighter support cut (quantity ≥ 35) than L1/L2: the
    * common-neighbor join materializes the FULL wedge set — it cannot
    * use the degree orientation, which only sees wedges centered below
    * both endpoints — so the input graph must be pruned harder for the
    * same wedge budget.
    *
    * Exact arithmetic throughout: common-neighbor counts are integers
    * from one self-join + partial agg; union = d(a)+d(b)−common; one
    * exact-decimal division. Top-20 by (jaccard DESC, a, b) plans
    * TakeOrderedAndProject. */
  def graphSimilar(spark: SparkSession, sfDir: String): DataFrame =
    neighborhoodSimilar(
      cachedCoOccurrenceEdges(spark, sfDir, minQty = 35))
      .orderBy(col("jacc").desc, col("na"), col("nb"))
      .limit(20)

  /** The similarity core over an arbitrary distinct undirected (u, v)
    * edge list: every pair with ≥ 1 common neighbor, with
    * common-neighbor count and neighborhood Jaccard — separated so the
    * similarity laws are pinnable on known graphs (`GraphsSpec`).
    *
    * Hub guard (round-11 verdict #2): the full wedge set at a center of
    * degree d is C(d, 2) rows through ONE shuffle key — a power-law hub
    * melts the stage, and no orientation trick applies because the FULL
    * common-neighbor count needs wedges centered at high-degree nodes
    * too. So the neighbor expansion goes through the same skew-capped
    * bucket discipline as every dedup candidate generator
    * ([[Buckets.members]]): only the `cap` smallest neighbors per
    * center expand into wedges (deterministic rank by neighbor id),
    * bounding the expansion at C(cap, 2) per node; the truncated
    * remainder stays observable via [[graphSimilarHealth]] instead of
    * becoming silent recall loss. Jaccard denominators still use FULL
    * degrees, so a capped count can only under-report a hub pair, never
    * over-score it. The oracle mirrors the cap rank-for-rank. */
  def neighborhoodSimilar(edges: DataFrame,
      cap: Int = Buckets.MaxBucket): DataFrame = {
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val common = Buckets.members(sym, Seq("src"), col("dst"), col("dst"), cap)
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("na"), col("p.b").as("nb"))
      .groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("cn"))
    common
      .join(deg.select(col("src").as("na"), col("d").as("da")), Seq("na"))
      .join(deg.select(col("src").as("nb"), col("d").as("db")), Seq("nb"))
      .select(col("na"), col("nb"), col("cn"),
        dbl(dec(col("cn")) / (col("da") + col("db") - col("cn"))).as("jacc"))
  }

  /** Support cut for [[graphComponents]] — part of the query's
    * declared semantics (the oracle mirrors it). Tighter than L1/L2's
    * 25 and L3's 35: at those cuts the co-occurrence graph is ONE
    * giant component at every fixture scale (labeling it is vacuous,
    * and the oracle's recursive closure on a size-n component builds
    * n² reach pairs). At 48 the graph is the high-support co-purchase
    * backbone: hundreds of small components (sf0.01: 644 nodes / 246
    * components, max 10; sf0.1: 6.5k nodes / 2.4k components, max 20)
    * — non-vacuous labels and a bounded closure in both engines. */
  val ComponentsMinQty = 48

  /** L4: connected-component labeling of the sparse co-occurrence
    * graph — the graph-family registration of the same large-star/
    * small-star machinery the dedup chain clusters with
    * ([[Components.connected]]; K19 labels near-dup docs, L4 labels
    * co-purchase groups). Per node: its component (min member id, the
    * deterministic convention) and the component size.
    *
    * Scale shape: the closure is O(log d) bounded-shuffle rounds over
    * the cached edge parquet (see [[Components]] for the iteration
    * story — throws at the round cap, never mislabels); the size frame
    * is component-cardinality and the final join is LEFT TO AQE
    * (component counts shrink with clustering, but a giant-component
    * graph would make a forced broadcast an OOM). Oracle: the
    * dedup_clusters recursive min-label closure over the identical
    * capped edge CTE. */
  def graphComponents(spark: SparkSession, sfDir: String): DataFrame = {
    // labels are a pure function of the edge list → build the closure
    // ONCE per fixture content (the components_v1 discipline of the
    // dedup chain); warm executions read a 2-column parquet
    // name carries the SAME inputs the edge cache's name does (support
    // cut, bucket cap, logic version) — the labels are derived from
    // that edge relation, so any input that re-keys the edges must
    // re-key the labels too, or a warm host serves labels built from
    // the OLD edge set
    val dir = FixtureCache.ensure(spark,
      s"cograph_l4_q${ComponentsMinQty}_b${Buckets.MaxBucket}_${EdgeCacheVersion}_${Components.Version}",
      sfDir, Seq(s"$sfDir/lineitem.parquet")) { tmp =>
      Components.connected(
          cachedCoOccurrenceEdges(spark, sfDir, ComponentsMinQty), "u", "v")
        .write.mode("overwrite").parquet(s"$tmp/labels")
    }
    val labels = spark.read.parquet(s"$dir/labels")
      .select(col("id").as("node"), col("lbl").as("component_id"))
    val sizes = labels.groupBy(col("component_id"))
      .agg(count(lit(1)).as("n_nodes"))
    labels.join(sizes, Seq("component_id"))
      .select(col("node"), col("component_id"), col("n_nodes"))
      .orderBy(col("component_id"), col("node"))
  }

  /** Hop cap for [[graphBfs]] — part of the query's declared semantics
    * (the oracle unrolls exactly this depth). */
  val BfsMaxHops = 6

  /** L6: bounded-depth BFS — single-source shortest hop distances over
    * the support-48 co-purchase backbone (the same cached edge relation
    * L4 labels), from the deterministic seed MIN(node). The "how far is
    * everything from X" primitive behind neighborhood expansion,
    * blast-radius queries, and k-hop feature extraction. Depth-capped
    * at [[BfsMaxHops]]: an unbounded closure over a 100-TB graph is the
    * textbook runaway job — every production k-hop query declares its k
    * up front, and the cap bounds both engines' work identically.
    *
    * Scale shape: the frontier loop is [[BfsMaxHops]] joins of a
    * (src-keyed, partitioned-and-checkpointed-once) symmetric edge
    * list against a frontier of at most node cardinality; the visited
    * set is subtracted with a left-anti join on the node key; every
    * round ends in an eager `localCheckpoint` (the [[pagerank]] /
    * [[Components]] discipline — without it round k re-derives rounds
    * 1..k−1 and the plan nests six joins deep). The seed is a 1-row
    * bounded aggregate inlined as a literal (the `AnnIvf` point-lookup
    * pattern — a broadcast at cluster scale). Oracle: recursive
    * min-distance closure over the identical capped edge CTE,
    * depth-guarded at the same cap. */
  def graphBfs(spark: SparkSession, sfDir: String): DataFrame =
    bfsDistances(cachedCoOccurrenceEdges(spark, sfDir, ComponentsMinQty))
      .orderBy(col("node"))

  /** The BFS core over an arbitrary distinct undirected (u, v) edge
    * list, seeded at MIN(node) — separated so the frontier laws (exact
    * path/cycle distances, the hop cap) are pinnable on known graphs
    * (`GraphsSpec`). */
  def bfsDistances(rawEdges: DataFrame): DataFrame = {
    val edges = rawEdges.iterCheckpoint()
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("src")).iterCheckpoint()
    // guarded seed lookup: an empty edge relation yields a NULL min
    // (would NPE on getLong), and a non-Long integer key type would
    // ClassCastException — both fail informatively instead, and any
    // integral key type is normalized through one checked cast
    // (round-14 advice)
    val seedRow = sym.agg(min(col("src")).cast("long")).head()
    require(!seedRow.isNullAt(0),
      "bfsDistances: empty edge relation — no seed node to start from")
    val src = seedRow.getLong(0)
    val session = edges.sparkSession
    import session.implicits._
    var dist = Seq((src, 0)).toDF("node", "dist").iterCheckpoint()
    var frontier = dist
    for (d <- 1 to BfsMaxHops) {
      frontier = frontier.withColumnRenamed("node", "src")
        .join(sym, Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .select(col("node"), lit(d).as("dist"))
        .iterCheckpoint()
      dist = dist.unionAll(frontier).iterCheckpoint()
    }
    dist
  }

  /** Fixed round count for [[graphLabelProp]] — declared semantics
    * (the oracle unrolls exactly this many rounds). */
  val LpaRounds = 3

  /** L7: label-propagation community detection (Raghavan et al. 2007,
    * public) — the near-linear community algorithm run on link/host
    * graphs to group sources before per-community curation decisions.
    * Deterministic synchronous variant: every node starts as its own
    * label; each round every node adopts the most frequent label among
    * its NEIGHBORS, ties broken by smallest label (bare LPA is
    * tie-nondeterministic — the same reason D22 re-implements mode).
    * Exactly [[LpaRounds]] rounds: fixed-round LPA is the declared
    * semantics (a convergence loop is data-dependent and
    * un-oracle-able), and on the sparse support-48 backbone three
    * rounds already collapse the small components.
    *
    * Scale shape per round: one co-partitioned join of the symmetric
    * edge list against the node-cardinality label frame + two
    * partial-agg passes ((node, label) counts, then the argmax via
    * `min_by` on the (−count, label) key — the D22 trick, no window,
    * no per-node subquery); eager localCheckpoint per round (the
    * [[pagerank]] discipline). Oracle: [[LpaRounds]] unrolled
    * count+row_number CTE rounds over the identical edge CTE. */
  def graphLabelProp(spark: SparkSession, sfDir: String): DataFrame = {
    val labels = labelPropagation(
      cachedCoOccurrenceEdges(spark, sfDir, ComponentsMinQty))
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("lbl"))
      .select(col("id").as("node"), col("lbl").as("community"),
        col("n_members"))
      .orderBy(col("community"), col("node"))
  }

  /** L9: MODULARITY of the L7 partition — the community-QUALITY metric
    * (Newman & Girvan 2004, public) that turns "LPA produced labels"
    * into a judged number: Q = Σ_c [ L_c/m − (d_c/2m)² ], the internal-
    * edge mass of each community against its degree-expected mass under
    * the configuration null model; Q > 0 means the partition beats
    * random, and a release pipeline tracks it per snapshot exactly like
    * K56 tracks token drift. Computed EXACTLY: one integer numerator
    * `4m·Σe_in − Σd_c²` over one decimal division (the proven share
    * discipline), so both engines agree bit-for-bit — a float Σ of
    * per-community terms would hash-flap on association order.
    *
    * Scale shape: two label joins onto the edge list (hash, co-keyed),
    * one degree fold, two tiny per-community partial aggs, 1-row
    * combines via AQE-broadcast cross joins. Oracle: the L7 unrolled-
    * LPA CTE extended with the identical aggregation. */
  def graphModularity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = cachedCoOccurrenceEdges(spark, sfDir, ComponentsMinQty)
      .iterCheckpoint()
    modularity(edges, labelPropagation(edges))
  }

  /** The modularity core over an arbitrary distinct undirected (u, v)
    * edge list and an (id, lbl) partition — separated so the metric's
    * laws (two disjoint triangles labeled apart → Q = 1/2; everything
    * in one community → Q = 0) are pinnable on known graphs
    * (`GraphsSpec`). */
  def modularity(rawEdges: DataFrame, labels: DataFrame): DataFrame = {
    val edges = rawEdges.iterCheckpoint()
    val tagged = edges
      .join(labels.select(col("id").as("u"), col("lbl").as("lu")), Seq("u"))
      .join(labels.select(col("id").as("v"), col("lbl").as("lv")), Seq("v"))
    val eIn = tagged.filter(col("lu") === col("lv"))
      .agg(count(lit(1)).as("e_in"))
    val degC = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .join(labels.select(col("id").as("n"), col("lbl")), Seq("n"))
      .groupBy(col("lbl")).agg(count(lit(1)).as("d"))
    val sums = degC.agg(sum(col("d") * col("d")).as("sum_d2"),
      count(lit(1)).as("n_communities"))
    edges.agg(count(lit(1)).as("m_edges"))
      .crossJoin(broadcast(eIn)).crossJoin(broadcast(sums))
      .select(col("n_communities"), col("m_edges"),
        col("e_in").as("n_internal_edges"),
        dbl(dec(lit(4L) * col("m_edges") * col("e_in") - col("sum_d2")) /
          (lit(4L) * col("m_edges") * col("m_edges"))).as("modularity"))
  }

  /** The LPA core over an arbitrary distinct undirected (u, v) edge
    * list: the (id, lbl) frame after [[LpaRounds]] deterministic
    * rounds — separated so the propagation laws (clique collapse,
    * disconnected-part independence) are pinnable on known graphs
    * (`GraphsSpec`). */
  def labelPropagation(rawEdges: DataFrame): DataFrame = {
    val edges = rawEdges.iterCheckpoint()
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      .repartition(col("dst")).iterCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")).iterCheckpoint()
    for (_ <- 1 to LpaRounds) {
      labels = sym
        .join(labels.select(col("id").as("dst"), col("lbl").as("nlbl")),
          Seq("dst"))
        .groupBy(col("src"), col("nlbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("src"))
        .agg(min_by(col("nlbl"),
          struct((-col("c")).as("nc"), col("nlbl"))).as("lbl"))
        .select(col("src").as("id"), col("lbl"))
        .iterCheckpoint()
    }
    labels
  }

  /** Degree bar and round cap for [[graphKcore]] — declared semantics
    * (the oracle unrolls exactly these). */
  val KcoreK = 3
  val KcoreRounds = 3

  /** L8: bounded k-core PEELING — the degeneracy-ordering primitive
    * behind dense-subgraph mining and community pre-filtering: nodes
    * of induced degree < k are peeled, which lowers neighbors'
    * degrees, which peels more. The registered semantics are exactly
    * [[KcoreRounds]] synchronous peel rounds at k = [[KcoreK]] (the
    * BFS/LPA fixed-round discipline: a run-to-fixpoint loop is
    * data-dependent and un-oracle-able; at production scale the round
    * count is a budget knob, each round one degree-agg + two semi
    * joins). Output: surviving nodes with their induced degree. */
  def graphKcore(spark: SparkSession, sfDir: String): DataFrame =
    kcorePeel(cachedCoOccurrenceEdges(spark, sfDir))
      .orderBy(col("node"))

  /** The peel core over an arbitrary distinct undirected (u, v) edge
    * list — separated so the peel laws (clique survival, tree
    * annihilation) are pinnable on known graphs (`GraphsSpec`). */
  def kcorePeel(rawEdges: DataFrame): DataFrame = {
    var edges = rawEdges.iterCheckpoint()
    for (_ <- 1 to KcoreRounds) {
      val sym = edges.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
      val keep = sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= KcoreK).select(col("src").as("id"))
      edges = edges
        .join(keep.select(col("id").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("id").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .iterCheckpoint()
    }
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }

  /** Companion observability row for L3 (the `dedup_health` pattern):
    * one row over the same support-35 graph reporting node/edge counts,
    * the max degree, and exactly how much the [[Buckets.MaxBucket]]
    * neighbor cap truncates — `n_capped_nodes` (centers whose neighbor
    * list exceeded the cap) and `n_dropped_neighbors` (Σ max(d−cap, 0),
    * the members [[neighborhoodSimilar]] never expanded). Zero at every
    * fixture scale; a power-law hub at 100 TB shows up HERE instead of
    * as a melted stage or silently-low similarity scores. */
  def graphSimilarHealth(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = cachedCoOccurrenceEdges(spark, sfDir, minQty = 35)
    val cap = Buckets.MaxBucket
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(edges.select(col("v").as("src"), col("u").as("dst")))
    sym.groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(
        count(lit(1)).as("n_nodes"),
        expr("sum(d) DIV 2").as("n_edges"),
        max(col("d")).as("max_degree"),
        sum(when(col("d") > cap, lit(1L)).otherwise(lit(0L)))
          .as("n_capped_nodes"),
        sum(greatest(col("d") - cap, lit(0L))).as("n_dropped_neighbors"))
  }

  /** Degree orientation: direct each undirected (u, v) edge from its
    * lower-(degree, id) endpoint `x` to the higher `y` (`dy` = y's
    * degree, carried for the canonical wedge-pair order). This is THE
    * scale guarantee of the triangle census — max out-degree is
    * O(√m) regardless of degree skew (a node keeps an out-edge only
    * toward neighbors of ≥ its own degree, and there can be at most
    * √(2m) nodes of degree ≥ √(2m)) — so it is exposed package-private
    * for `GraphsSpec` to pin on a planted hub. */
  private[graft] def orientLowHigh(edges: DataFrame, deg: DataFrame): DataFrame = {
    val du = deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du")
    val dv = deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv")
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    edges.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("x"),
        when(lowFirst, col("v")).otherwise(col("u")).as("y"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dy"))
  }

  /** The census core over an arbitrary distinct undirected edge list
    * (`u` < `v`, both integral) — separated so the graph laws are
    * pinnable on known graphs (`GraphsSpec`) independent of the
    * co-occurrence construction. */
  def triangleCensus(rawEdges: DataFrame): DataFrame = {
    // materialize the edge list ONCE (eager localCheckpoint — the
    // Components lineage-truncation discipline): the census reads it
    // from five plan branches (degrees, stats, the oriented join, and
    // the wedge self-join twice); without truncation each branch
    // re-derives the co-occurrence expansion from the base scan. A
    // production pipeline persists the built graph for the same reason.
    val edges = rawEdges.iterCheckpoint()
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .iterCheckpoint()
    // n_nodes / n_edges / n_wedges in ONE pass over the degree table
    // (n_edges = Σd / 2 — edges never re-scanned for a plain count)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(d) DIV 2").as("n_edges"),
      sum(expr("(d * (d - 1)) DIV 2")).as("n_wedges"))
    val fwd = orientLowHigh(edges, deg).iterCheckpoint()
    // wedge at x over canonically-ordered out-neighbor pairs; the
    // closing edge, if present, is oriented y1→y2 by the same total
    // order, so one equi-join closes the triangle exactly once
    val e1 = fwd.select(col("x").as("x1"), col("y").as("y1"), col("dy").as("d1"))
    val e2 = fwd.select(col("x").as("x2"), col("y").as("y2"), col("dy").as("d2"))
    val closer = fwd.select(col("x").as("cx"), col("y").as("cy"))
    val tri = e1.join(e2,
        col("x1") === col("x2") &&
          (col("d1") < col("d2") || (col("d1") === col("d2") && col("y1") < col("y2"))))
      .join(closer, col("y1") === col("cx") && col("y2") === col("cy"))
      .agg(count(lit(1)).as("n_triangles"))
    stats.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast("double"))
          .otherwise(dbl(dec(col("n_triangles") * 3) / col("n_wedges")))
          .as("clustering"))
  }

  /** L5: log2-binned degree distribution of the co-occurrence graph —
    * the profile read BEFORE running any other graph op: whether the
    * degree histogram is heavy-tailed decides every downstream
    * strategy choice (the L1 orientation bound, the L3 neighbor cap,
    * C12-style hub salting). Binning is `length(bin(d)) − 1` — the
    * EXACT integer ⌊log2⌋ via the binary-digit count, because a float
    * `log2` lands on either side of a power of two per engine/libm
    * and would flip boundary nodes between buckets. Per bucket: node
    * count, observed degree min/max (must tile within the bucket's
    * [2^b, 2^b+1) span), and total degree mass.
    *
    * Scale shape: reads the cached edge parquet, one endpoint-melt +
    * two partial-agg passes (node-cardinality then ≤64 bucket keys) —
    * no window, no join. */
  /** L10: LOCAL clustering coefficient, log2-degree-bucketed — how
    * tightly each degree class's neighborhoods close into triangles:
    * per node, T(v) triangles over d(v)·(d(v)−1)/2 possible wedge
    * closures, reported per L5 degree bucket as the RATIO OF SUMS
    * (ΣT / Σwedges — one exact-integer division per bucket). A
    * mean-of-per-node-ratios would sum doubles, whose result depends
    * on reduction order and flaps across engines/partitionings; the
    * sums are exact BIGINTs, so the single final division is
    * bit-deterministic. Triangle rows come from the same L1
    * degree-orientation join (out-degree ≤ O(√m) bounds the wedge
    * work); each triangle credits all THREE corners via one explode,
    * and the per-node counts join back to the degree table on the
    * node key — dimension-cardinality work after the oriented join. */
  def graphClusteringCoeff(spark: SparkSession, sfDir: String): DataFrame =
    clusteringByDegreeBucket(cachedCoOccurrenceEdges(spark, sfDir))

  /** The L10 core over an arbitrary distinct undirected (u, v) edge
    * list — separated (the [[triangleCensus]] pattern) so known-graph
    * laws pin it directly in `GraphsSpec`. */
  private[graft] def clusteringByDegreeBucket(rawEdges: DataFrame): DataFrame = {
    val edges = rawEdges.iterCheckpoint()
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .iterCheckpoint()
    val fwd = orientLowHigh(edges, deg).iterCheckpoint()
    val e1 = fwd.select(col("x").as("x1"), col("y").as("y1"), col("dy").as("d1"))
    val e2 = fwd.select(col("x").as("x2"), col("y").as("y2"), col("dy").as("d2"))
    val closer = fwd.select(col("x").as("cx"), col("y").as("cy"))
    val triPerNode = e1.join(e2,
        col("x1") === col("x2") &&
          (col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("y1") < col("y2"))))
      .join(closer, col("y1") === col("cx") && col("y2") === col("cy"))
      .select(explode(array(col("x1"), col("y1"), col("y2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("t"))
    deg.join(triPerNode, Seq("node"), "left_outer")
      .select(col("d"), coalesce(col("t"), lit(0L)).as("t"))
      .groupBy((length(bin(col("d"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("t")).as("tri_sum"),
        sum(expr("(d * (d - 1)) DIV 2")).as("wedge_sum"))
      .withColumn("coeff",
        when(col("wedge_sum") === 0, lit(null).cast("double"))
          .otherwise(col("tri_sum").cast("double") /
            col("wedge_sum").cast("double")))
      .orderBy(col("bucket"))
  }

  /** L11: degree ASSORTATIVITY — the Pearson correlation of endpoint
    * degrees over the edge relation (Newman's r): does the graph wire
    * hubs to hubs (r > 0, social-network shape) or hubs to leaves
    * (r < 0, hub-and-spoke)? The sign decides whether C12-style hub
    * salting or the L1 orientation bound is the binding mitigation at
    * scale. Each undirected edge contributes BOTH orientations
    * (du, dv) and (dv, du) — the standard symmetrization, which also
    * makes the two marginal moment sets identical. Degrees are exact
    * BIGINTs, so all five moments are exact integer sums and the
    * coefficient is ONE closed-form double expression — the D28
    * discipline on graph shape; degree-join + one map-side-combined
    * pass, no window, no iteration. */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = cachedCoOccurrenceEdges(spark, sfDir).iterCheckpoint()
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val du = deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du")
    val dv = deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv")
    val both = edges.join(du, Seq("u")).join(dv, Seq("v"))
      .select(col("du").as("x"), col("dv").as("y"))
      .unionAll(edges.join(du, Seq("u")).join(dv, Seq("v"))
        .select(col("dv").as("x"), col("du").as("y")))
    both.agg(
        count(lit(1)).as("m2"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sx2"),
        sum(col("y") * col("y")).as("sy2"))
      .select(col("m2"),
        round((col("m2").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
          / sqrt((col("m2").cast("double") * col("sx2").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            * (col("m2").cast("double") * col("sy2").cast("double")
              - col("sy").cast("double") * col("sy").cast("double"))), 6)
          .as("assortativity"))
  }

  def graphDegreeDist(spark: SparkSession, sfDir: String): DataFrame = {
    val e = cachedCoOccurrenceEdges(spark, sfDir)
    e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
      .groupBy((length(bin(col("d"))) - 1).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_nodes"), min(col("d")).as("min_deg"),
        max(col("d")).as("max_deg"), sum(col("d")).as("deg_sum"))
      .orderBy(col("bucket"))
  }

  /** HITS iteration count — mirrored by the oracle's unrolled CTEs. */
  val HitsIters = 3

  /** Support threshold for the bipartite customer→part edge set. */
  val HitsMinQty = 40

  /** L12: HITS hubs & authorities (Kleinberg 1999, public) on the
    * DIRECTED bipartite purchase graph customer→part — the one graph
    * in the fixture where hub and authority are genuinely different
    * roles (on an undirected graph the two HITS vectors coincide):
    * a part's authority is the summed hub mass of the customers
    * buying it, a customer's hub score the summed authority of the
    * parts they buy — "influential buyers" and "anchor products"
    * emerge together, which is exactly the bipartite setting HITS was
    * designed for. [[HitsIters]] mutual-reinforcement rounds under
    * L1 normalization; top-10 of each role, one `role`-tagged frame.
    *
    * Float discipline (the [[pagerank]] contract): scores carry 12 dp
    * rounds, every cross-node sum is an exact DECIMAL(28,14) fold of
    * those rounded terms, and each normalization is ONE IEEE divide
    * of exact-decimal-derived doubles — both engines walk the
    * identical float sequence, so the oracle can unroll the exact
    * iteration count as CTEs.
    *
    * Scale shape: the edge list is built once (distinct collapses the
    * lineitem fan-in) and checkpointed TWICE — one copy
    * hash-partitioned on the customer key for the hub-side join, one
    * on the part key for the authority side — so each round exchanges
    * only the node-cardinality score frames, never the edge list;
    * normalization denominators stay IN the dataflow as 1-row
    * broadcast frames (never a driver round-trip). */
  def graphHits(spark: SparkSession, sfDir: String): DataFrame =
    hits(cachedHitsEdges(spark, sfDir))

  /** The L12 bipartite edge list, lazily derived. */
  def hitsEdges(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .join(t(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") >= HitsMinQty)
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()

  /** Build-once parquet of [[hitsEdges]] — the cograph cache
    * discipline (name carries the support cut + a logic version;
    * content key tracks the fixture parquet). Cached == lazy row
    * identity pinned in `GraphsSpec`. */
  def cachedHitsEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = FixtureCache.ensure(spark, s"hits_edges_q${HitsMinQty}_v1",
      sfDir, Seq(s"$sfDir/lineitem.parquet", s"$sfDir/orders.parquet")) {
      staging =>
        hitsEdges(spark, sfDir)
          .write.mode("overwrite").parquet(s"$staging/edges.parquet")
    }
    spark.read.parquet(s"$dir/edges.parquet")
  }

  /** HITS core over an arbitrary distinct directed (c, p) edge list —
    * see [[graphHits]] for the discipline. */
  def hits(rawEdges: DataFrame): DataFrame = {
    // Partition-once, TWICE (round-16 verdict #1): the hub half joins
    // edges on c, the authority half on p — one pre-partitioned copy
    // per join key, each checkpointed, so NEITHER half-iteration ever
    // exchanges the edge list again. With a single c-keyed copy the
    // p-side join re-shuffled the FULL edge list every iteration — at
    // 100 TB that is HitsIters avoidable edge shuffles; the second
    // copy costs one extra shuffle+materialization at setup (the same
    // trade pagerank makes with its symd checkpoint). Score frames
    // come out of groupBy(p)/groupBy(c) already hash-partitioned on
    // the matching key, so iteration exchanges carry only
    // node-cardinality partial sums.
    val edgesC = rawEdges.repartition(col("c")).iterCheckpoint()
    val edgesP = rawEdges.repartition(col("p")).iterCheckpoint()
    val DL = DecimalType(28, 14)
    val nC = broadcast(edgesC.select(col("c")).distinct()
      .agg(count(lit(1)).cast("double").as("n")).iterCheckpoint())
    var h = edgesC.select(col("c")).distinct().crossJoin(nC)
      .select(col("c"), round(lit(1.0) / col("n"), 12).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to HitsIters) {
      // Checkpoint the per-node sums ONCE per half-iteration: the
      // normalization total and the score frame both derive from the
      // checkpointed sum, so the edge join runs once, not twice, and
      // the tiny crossJoin-normalize stays lazy (bounded lineage).
      // (r21 examined: making this lazy and relying on exchange reuse
      // between the two consumers does NOT work — column pruning gives
      // the normalization subtree a narrower exchange, nothing reuses,
      // and the measured job count went 43 → 45 with wall time +10 %.)
      val sa = edgesC.join(h, Seq("c"))
        .groupBy(col("p")).agg(sum(col("h").cast(DL)).as("s"))
        .iterCheckpoint()
      val na = broadcast(sa.agg(sum(col("s")).as("tot")))
      a = sa.crossJoin(na)
        .select(col("p"), round(col("s").cast("double") /
          col("tot").cast("double"), 12).as("a"))
      val sh = edgesP.join(a, Seq("p"))
        .groupBy(col("c")).agg(sum(col("a").cast(DL)).as("s"))
        .iterCheckpoint()
      val nh = broadcast(sh.agg(sum(col("s")).as("tot")))
      h = sh.crossJoin(nh)
        .select(col("c"), round(col("s").cast("double") /
          col("tot").cast("double"), 12).as("h"))
    }
    val topAuth = a.orderBy(col("a").desc, col("p")).limit(10)
      .select(lit("authority").as("role"), col("p").cast("long").as("node"),
        col("a").as("score"))
    val topHub = h.orderBy(col("h").desc, col("c")).limit(10)
      .select(lit("hub").as("role"), col("c").cast("long").as("node"),
        col("h").as("score"))
    topAuth.unionAll(topHub)
      .orderBy(col("role"), col("score").desc, col("node"))
  }

  /** L14: directed-graph RECIPROCITY + dyad census — over the
    * part-succession graph (within each order, an edge from every
    * line's part to the NEXT line's part in linenumber order: the
    * "bought together, in sequence" digraph), what fraction of
    * directed edges has its reverse also present? Classic digraph
    * health metric (Garlaschelli-Loffredo r), with the dyad census
    * (mutual / asymmetric pairs) that explains it. Exact integers +
    * one exact-decimal ratio.
    *
    * Scale shape: the edge derivation is ONE window pass (lead over
    * linenumber, partitioned by order — lineitem's natural key, one
    * shuffle) then distinct at edge cardinality; reciprocity is a
    * LEFT SEMI self-join of the distinct edge list against its own
    * reversal on the (src,dst) hash key — edge-cardinality exchanges,
    * no fan-out, no per-node state, so a trillion-edge census is the
    * same three exchanges. Never the naive "group neighbors per node
    * and intersect" (hub-degree quadratic). */
  def graphReciprocity(spark: SparkSession, sfDir: String): DataFrame = {
    // (orderkey, linenumber) is NOT unique in the fixture — the lead
    // order must be fully tie-broken or the edge set is
    // engine-ambiguous; adding partkey makes ties interchangeable
    // (equal src ⇒ identical dst assignment under any tie order)
    val wNext = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("src"))
    val edges = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(wNext))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
    reciprocityCensus(edges)
  }

  /** The reciprocity/dyad census over an arbitrary DISTINCT
    * (src, dst) edge list — separated so `GraphsSpec` can pin the
    * exact dyad counts on constructed digraphs (a known mutual pair,
    * a pure one-way path, a fully symmetric graph ⇒ reciprocity 1). */
  private[graft] def reciprocityCensus(edges: DataFrame): DataFrame = {
    val reciprocated = edges.as("e").join(
      edges.select(col("dst").as("src"), col("src").as("dst")).as("r"),
      Seq("src", "dst"), "left_semi")
    val nodes = edges.select(explode(array(col("src"), col("dst")))
      .as("node")).distinct()
    val eAgg = edges.agg(count(lit(1)).as("n_edges"))
    val rAgg = reciprocated.agg(count(lit(1)).as("n_reciprocated"))
    val nAgg = nodes.agg(count(lit(1)).as("n_nodes"))
    eAgg.crossJoin(broadcast(rAgg)).crossJoin(broadcast(nAgg))
      .select(col("n_nodes"), col("n_edges"),
        col("n_reciprocated"),
        // integer DIV end-to-end (n_reciprocated is even by
        // construction) — no float round-trip, matches the oracle's //
        expr("n_reciprocated DIV 2").as("n_mutual_pairs"),
        (col("n_edges") - col("n_reciprocated")).as("n_asymmetric"),
        // empty-edge guard: ANSI double division by zero throws;
        // a degenerate input (all self-loops) yields NULL reciprocity
        when(col("n_edges") > 0,
          dbl(dec(col("n_reciprocated")) / col("n_edges")))
          .as("reciprocity"))
  }
}
