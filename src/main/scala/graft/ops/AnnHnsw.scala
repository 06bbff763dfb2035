package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HNSW-style HIERARCHICAL graph-probe ANN — the full shape of Malkov
  * & Yashunin 2016 (public) over the [[AnnNsw]] single-layer core: a
  * stack of proximity graphs where layer l keeps an exponentially
  * thinner subsample of nodes, searched by greedy descent — coarse
  * long-range moves on the sparse upper layers land the beam near the
  * answer before the dense layer-0 beam search runs. The hierarchy is
  * what removes NSW's dependence on good entry points: upper layers ARE
  * the entry-point structure.
  *
  * Determinism: production HNSW draws node levels from a geometric
  * distribution at insert time; this build assigns them by a FIXED id
  * rule ([[levelOf]]: id % 256 → level 2, id % 16 → level 1 — the same
  * 1/16 decay) so the index, the search walk, and the pins are exactly
  * reproducible. Same trade as the seeded IVF codebook.
  *
  * Offline ([[ensureIndex]], FixtureCache commit discipline): per
  * layer, the top-[[AnnNsw.M]] exact-cosine neighbors among the
  * layer's members sharing an IVF cell (the [[AnnNsw.buildGraph]]
  * kernel — cell-bounded, never all-pairs), all layers in ONE parquet
  * keyed by a `layer` column so each search hop is a pushed-down
  * (layer, src IN …) point lookup; plus the single global entry (min
  * id of the top layer).
  *
  * Online ([[searchTopK]]): greedy descent with a narrow beam
  * ([[UpperBeam]], [[UpperHops]] hops per layer) from the top layer
  * down to layer 1, then the wide [[AnnNsw.Beam]] fixed-hop search on
  * layer 0 seeded by the descended beam. The driver holds only the
  * O(beam) frontier; vectors are read ONLY for scored candidates.
  *
  * Registered rows-only (`sim_hnsw_topk`): the index depends on the
  * seeded k-means cells. Layer-membership/descent/determinism laws in
  * `AnnNswSpec`; recall vs brute force in `GroundTruthSpec`.
  */
object AnnHnsw {
  /** Top layer index (layers 0..MaxLevel). */
  val MaxLevel = 2
  /** Beam width during the upper-layer descent. */
  val UpperBeam = 4
  /** Hops per upper layer. */
  val UpperHops = 2

  /** Deterministic level assignment — the 1/16-decay id rule. */
  def levelOf(idCol: Column): Column =
    when(idCol % 256 === 0, lit(2))
      .when(idCol % 16 === 0, lit(1))
      .otherwise(lit(0))

  /** Build-once hierarchical index: layered adjacency at
    * `<dir>/layers` (layer, src, dst), global entry at `<dir>/entry`. */
  def ensureIndex(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, sourceDir: String): String =
    FixtureCache.ensure(spark, s"hnsw_graph_m${AnnNsw.M}_l${MaxLevel}_v2",
      sourceDir, Seq(s"$sourceDir.parquet")) { tmp =>
      val model = AnnIvf.codebook(df, vecCol, AnnIvf.FitSampleFraction)
      val assigned = model.transform(df.withColumn("fv",
        org.apache.spark.ml.functions.array_to_vector(col(vecCol))))
        .select(col(idCol), col(vecCol), col("cell"))
        .withColumn("lvl", levelOf(col(idCol)))
        .localCheckpoint(true)
      // layer 0 is cell-bounded (the NSW kernel — never all-pairs on
      // the full corpus); upper layers are GLOBAL pairwise over their
      // exponentially thin membership — that is the whole point of the
      // hierarchy: long-range edges that CROSS cell boundaries, so the
      // descent can reach any region (a cell-bounded upper layer could
      // never leave the entry's cell). Layer-l pairwise volume is
      // n²/16^2l — dominated by layer 1's n²/256; at true 100-TB scale
      // layer 1 itself gets built by descent through layer 2 (the HNSW
      // insert recursion) instead of one join.
      val layers = (0 to MaxLevel).map { l =>
        val members = assigned.filter(col("lvl") >= l)
        val scoped = if (l == 0) members
          else members.withColumn("cell", lit(0))
        val (adj, _) = AnnNsw.buildGraph(scoped, idCol, vecCol)
        adj.withColumn("layer", lit(l))
      }.reduce(_ unionByName _)
      layers.write.mode("overwrite").parquet(s"$tmp/layers")
      assigned.filter(col("lvl") >= MaxLevel)
        .agg(min(col(idCol)).as("entry"))
        .write.mode("overwrite").parquet(s"$tmp/entry")
    }

  /** Greedy hierarchical search: descend the upper layers with a
    * narrow beam, then run the wide layer-0 beam. Returns top-k
    * (idCol, score), 6-dp rounded, fully tie-broken. */
  def searchTopK(spark: SparkSession, indexDir: String, nodes: DataFrame,
      idCol: String, vecCol: String, qVec: Seq[Float], k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val layers = spark.read.parquet(s"$indexDir/layers")
    val qLit = array(qVec.map(lit).toIndexedSeq: _*)
    val scoreCol = AnnLsh.cosine(col(vecCol).cast("array<double>"),
      qLit.cast("array<double>"))

    def scoreIds(ids: Seq[Long]): Map[Long, Double] =
      if (ids.isEmpty) Map.empty
      else nodes.filter(col(idCol).isin(ids: _*))
        .select(col(idCol), scoreCol.as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    def expand(layer: Int, beam: Seq[Long],
        scored: Map[Long, Double]): Seq[Long] =
      layers.filter(col("layer") === layer && col("src").isin(beam: _*))
        .select(col("dst")).distinct()
        .collect().map(_.getLong(0)).toSeq
        .filterNot(scored.contains)

    def top(scored: Map[Long, Double], width: Int): Seq[Long] =
      scored.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(width).map(_._1)

    val entry = spark.read.parquet(s"$indexDir/entry")
      .collect().head.getLong(0)
    var scored: Map[Long, Double] = scoreIds(Seq(entry))
    var beam: Seq[Long] = top(scored, UpperBeam)
    for (l <- MaxLevel to 1 by -1; _ <- 1 to UpperHops) {
      scored = scored ++ scoreIds(expand(l, beam, scored))
      beam = top(scored, UpperBeam)
    }
    beam = top(scored, AnnNsw.Beam)
    for (_ <- 1 to AnnNsw.Hops) {
      scored = scored ++ scoreIds(expand(0, beam, scored))
      beam = top(scored, AnnNsw.Beam)
    }
    val answer = excludeId.fold(beam)(q => beam.filterNot(_ == q))
    nodes.filter(col(idCol).isin(answer: _*))
      .select(col(idCol), round(scoreCol, 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
