package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the grouping stage that
  * turns near-duplicate PAIRS into dedup CLUSTERS (keep one canonical
  * document per component, drop the rest). Pairs alone don't dedup a
  * corpus: if A~B and B~C, A and C must land in the same cluster even
  * though the pair (A, C) was never emitted.
  *
  * Algorithm: iterative min-label propagation — every vertex starts
  * labeled with its own id, and each round adopts the minimum label in
  * its neighborhood, converging in O(component diameter) rounds. Each
  * round is one shuffle-join + aggregate; the fixpoint check is a
  * scalar count per round (a deliberate driver-side scalar job — the
  * loop is data-dependent, like any iterative graph algorithm on
  * Spark). Near-dup components are shallow (most are pairs/triangles),
  * so rounds stay in the low single digits; a hard cap bounds
  * pathological chains. At extreme scale the same loop upgrades to the
  * large-star/small-star variant (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014 — public
  * literature); each round here is exactly its small-star step.
  */
object Components {
  /** Hard iteration cap: components with diameter beyond this are
    * pathological chains for near-dup data (each hop is a ≥0.5-Jaccard
    * edge); the loop stops there rather than running unbounded. */
  val MaxRounds = 20

  /** (id, cluster_id, is_canonical) for every vertex of `edges`;
    * cluster_id = the minimum member id of the component.
    *
    * Each round ends in an eager `localCheckpoint`: iterative plans
    * otherwise EMBED the previous round's plan twice per round (once in
    * the propagation join, once in the fixpoint comparison), doubling
    * the logical tree every iteration until planning itself OOMs — the
    * checkpoint truncates lineage to the materialized rows, which is
    * the standard Spark shape for any data-dependent loop. */
  def connected(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < MaxRounds) {
      round += 1
      val neighborMin = und
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(min(col("lbl")).as("nbr_lbl"))
      // carry the previous label through the checkpoint so the
      // fixpoint check is a filter over materialized rows, not an
      // extra join+shuffle per round
      val next = labels
        .join(neighborMin, col("id") === col("dst"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"),
          col("lbl").as("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("lbl") =!= col("prev")).count()
      labels = next.select(col("id"), col("lbl"))
    }
    labels
  }
}
