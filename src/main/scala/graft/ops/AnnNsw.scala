package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NSW-style graph-probe approximate nearest neighbors — the
  * navigable-small-world rung of the ANN family (public: Malkov &
  * Yashunin, "Efficient and robust approximate nearest neighbor search
  * using Hierarchical Navigable Small World graphs", 2016; this is the
  * single-layer NSW core with a fixed-hop beam search — the probe-order
  * idea, without the hierarchy).
  *
  * Offline (build once per corpus, [[ensureGraph]] via the
  * [[FixtureCache]] commit discipline):
  *  - a proximity GRAPH: per node, its top-[[M]] neighbors by exact
  *    cosine among the candidates sharing the node's IVF cell (the
  *    [[AnnIvf]] codebook is the candidate generator — within-cell
  *    pairwise is the standard kNN-graph seed, and the same skew story
  *    as [[SemDedup]]: cell-bounded, never all-pairs);
  *  - one ENTRY POINT per cell (min id) — the small-world shortcut
  *    set that gives the search global reach without long edges.
  *
  * Online ([[searchTopK]]): greedy BEAM search — start from the entry
  * points, expand each beam member's adjacency list, score the new
  * candidates by exact cosine against the query, keep the best
  * [[Beam]], repeat [[Hops]] times, answer with the top-k of the final
  * beam. The traversal is inherently sequential (HNSW's too — this is
  * a point-serving query, not a scan): the driver holds only the
  * O(Beam) frontier ids and scores per hop; every data touch is a
  * Spark job over the parquet graph/corpus with an `IN`-list predicate
  * that pushes down to the scan (bounded ≤ Beam×M ids — point lookups,
  * the shape a bucketed/sorted layout turns into row-group skips at
  * 100 TB). The corpus vectors are read ONLY for scored candidates,
  * never scanned.
  *
  * Registered rows-only (`sim_nsw_topk`): the graph depends on the
  * seeded k-means cells — not portable SQL. Mechanics (out-degree law,
  * planted duplicate, determinism, beam⊆scored) pinned in `AnnNswSpec`;
  * recall vs brute force pinned in `GroundTruthSpec`.
  */
object AnnNsw {
  /** Neighbors kept per node (the NSW out-degree bound). */
  val M = 8
  /** Beam width of the online search. */
  val Beam = 32
  /** Fixed hop count — fixed-depth search is the declared semantics
    * (a convergence loop is data-dependent and unpinnable). */
  val Hops = 3

  /** Adjacency directory-bucket fan-out (r18 verdict #2): the
    * persisted graph partitions by `bkt = src mod ProbeBuckets`, so a
    * beam-search hop's `src IN (beam)` probe prunes to the beam's own
    * bucket DIRECTORIES instead of scanning the whole adjacency file —
    * at a 100-TB index each hop reads ~beam/ProbeBuckets of the
    * layout, not all of it. Pure id arithmetic (no hash) so the probe
    * side can compute bucket literals driver-side. */
  val ProbeBuckets = 16

  /** The probe-side bucket of an id — MUST mirror the write-side
    * `pmod(src, ProbeBuckets)` exactly. */
  def bucketOf(id: Long): Int =
    (((id % ProbeBuckets) + ProbeBuckets) % ProbeBuckets).toInt

  /** Build the proximity graph + entry points from an IVF cell
    * assignment. One within-cell self-join (cell-bounded candidate
    * volume), one per-node top-M window, one per-cell min — all
    * partial-agg / windowed shapes, no all-pairs anywhere. */
  def buildGraph(assigned: DataFrame, idCol: String,
      vecCol: String): (DataFrame, DataFrame) = {
    val a = assigned.select(col("cell"), col(idCol).as("src"),
      col(vecCol).as("va"))
    val b = assigned.select(col("cell"), col(idCol).as("dst"),
      col(vecCol).as("vb"))
    val scored = a.join(b, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        AnnLsh.cosine(col("va").cast("array<double>"),
          col("vb").cast("array<double>")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(col("score").desc, col("dst"))
    val adjacency = scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= M)
      .select(col("src"), col("dst"))
    val entries = assigned.groupBy(col("cell"))
      .agg(min(col(idCol)).as("entry"))
      .select(col("entry"))
    (adjacency, entries)
  }

  /** Build-once graph bootstrap: IVF codebook (shared discipline with
    * [[AnnIvf]]), cell assignment, adjacency + entries committed under
    * one [[FixtureCache]] dir keyed by the corpus content. Returns the
    * committed dir; adjacency at `<dir>/adjacency`, entries at
    * `<dir>/entries`. */
  def ensureGraph(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, sourceDir: String): String =
    FixtureCache.ensure(spark, s"nsw_graph_m${M}_v2", sourceDir,
      Seq(s"$sourceDir.parquet")) { tmp =>
      val model = AnnIvf.codebook(df, vecCol, AnnIvf.FitSampleFraction)
      val assigned = model.transform(df.withColumn("fv",
        org.apache.spark.ml.functions.array_to_vector(col(vecCol))))
        .select(col(idCol), col(vecCol), col("cell"))
      val (adjacency, entries) = buildGraph(assigned, idCol, vecCol)
      // src-bucketed layout: each search hop prunes to the beam's own
      // bucket directories (see [[ProbeBuckets]])
      adjacency
        .withColumn("bkt", pmod(col("src"), lit(ProbeBuckets)).cast("int"))
        .write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$tmp/adjacency")
      entries.write.mode("overwrite").parquet(s"$tmp/entries")
    }

  /** Greedy beam search over a committed graph. `nodes` is the corpus
    * (idCol, vecCol) — vectors are fetched only for scored candidate
    * ids. Returns the top-k as (idCol, score) with the [[AnnIvf]]
    * 6-dp rounding, fully tie-broken. */
  def searchTopK(spark: SparkSession, graphDir: String, nodes: DataFrame,
      idCol: String, vecCol: String, qVec: Seq[Float], k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val adjacency = spark.read.parquet(s"$graphDir/adjacency")
    val qLit = array(qVec.map(lit).toIndexedSeq: _*)
    val scoreCol = AnnLsh.cosine(col(vecCol).cast("array<double>"),
      qLit.cast("array<double>"))

    /** Exact-cosine scores for a bounded id list — one pushed-down
      * point-lookup scan, O(ids) rows back to the driver. */
    def scoreIds(ids: Seq[Long]): Map[Long, Double] =
      if (ids.isEmpty) Map.empty
      else nodes.filter(col(idCol).isin(ids: _*))
        .select(col(idCol), scoreCol.as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val entries = spark.read.parquet(s"$graphDir/entries")
      .collect().map(_.getLong(0)).toSeq
    var scored: Map[Long, Double] = scoreIds(entries)
    var beam: Seq[Long] = scored.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(Beam).map(_._1)
    for (_ <- 1 to Hops) {
      // bucket literals first: partition pruning cuts the directories
      // read to the beam's buckets BEFORE the row-level src filter
      val bkts = beam.map(bucketOf).distinct
      val expand = adjacency
        .filter(col("bkt").isin(bkts: _*) && col("src").isin(beam: _*))
        .select(col("dst")).distinct()
        .collect().map(_.getLong(0)).toSeq
        .filterNot(scored.contains)
      scored = scored ++ scoreIds(expand)
      beam = scored.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(Beam).map(_._1)
    }
    val answer = excludeId.fold(beam)(q => beam.filterNot(_ == q))
    // the final answer is computed BY SPARK over the beam ids — the
    // driver hands back only the id list it navigated to
    nodes.filter(col(idCol).isin(answer: _*))
      .select(col(idCol), round(scoreCol, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
