package graft

import graft.ops.SemDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup semantic dedup: planted near-parallel vectors must be
  * dropped down to one min-id representative per component, unrelated
  * vectors must survive, and a duplicate pair split across cells is
  * missed BY DESIGN (the paper's within-cluster recall trade). Cells
  * are assigned explicitly here so the decisions under test are exact,
  * independent of the seeded codebook. */
class SemDedupSpec extends SparkTestBase {

  private def assigned(rows: Seq[(Long, Seq[Float], Int)]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "cell")
  }

  private def rand(seed: Long): Seq[Float] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(16)(rnd.nextGaussian().toFloat)
  }
  // near-parallel: scaling preserves direction exactly (cosine 1)
  private def copyOf(v: Seq[Float], s: Float): Seq[Float] = v.map(_ * s)

  test("planted duplicate groups collapse to the min-id member; singletons survive") {
    val a = rand(1); val b = rand(2)
    val rows = Seq(
      (10L, a, 0), (11L, copyOf(a, 1.01f), 0), (12L, copyOf(a, 0.97f), 0),
      (20L, b, 0), (21L, copyOf(b, 2.0f), 0),
      (30L, rand(3), 0), (31L, rand(4), 1))
    val out = SemDedup.dedup(assigned(rows), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(10L) == ((10L, true)))
    assert(out(11L) == ((10L, false)))
    assert(out(12L) == ((10L, false)))
    assert(out(20L) == ((20L, true)))
    assert(out(21L) == ((20L, false)))
    assert(out(30L) == ((30L, true)))
    assert(out(31L) == ((31L, true)))
  }

  test("top_cos reports the within-cell max cosine; singleton cells are NULL") {
    val a = rand(11)
    val rows = Seq(
      (1L, a, 0), (2L, copyOf(a, 1.5f), 0), (3L, rand(12), 0),
      (9L, rand(13), 7))
    val rs = SemDedup.dedup(assigned(rows), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r).toMap
    // the parallel pair sees cosine 1 (rounded 6dp)
    assert(rs(1L).getDouble(4) == 1.0)
    assert(rs(2L).getDouble(4) == 1.0)
    // 3 shares the cell, so it has SOME cosine, strictly below tau
    assert(!rs(3L).isNullAt(4) && rs(3L).getDouble(4) < SemDedup.Tau)
    // alone in cell 7 → no pair → NULL
    assert(rs(9L).isNullAt(4))
    // sub-tau / pairless members are all kept
    assert(rs(3L).getBoolean(3) && rs(9L).getBoolean(3))
  }

  test("a duplicate pair split across cells is missed by design (documented recall trade)") {
    val a = rand(21)
    val rows = Seq((1L, a, 0), (2L, copyOf(a, 1.0f), 1), (3L, rand(22), 0))
    val rs = SemDedup.dedup(assigned(rows), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(rs == Map(1L -> true, 2L -> true, 3L -> true))
  }

  test("transitive closure: a~b and b~c cluster all three even without the (a,c) pair") {
    // three near-parallel vectors: every within-cell pair clears tau, so
    // closure is exercised via the component stage on the chained pairs
    val a = rand(31)
    val rows = Seq(
      (5L, a, 0), (6L, copyOf(a, 1.2f), 0), (7L, copyOf(a, 0.8f), 0))
    val rs = SemDedup.dedup(assigned(rows), "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rs == Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("registered query: every fixture vector gets a decision row; decisions are pair-consistent") {
    // fixture-shape-agnostic (the driver regenerates embeddings between
    // rounds): row count comes from the fixture itself, and instead of
    // asserting "no duplicates exist" — a distributional accident a
    // regenerated fixture or a chance near-parallel pair would break —
    // we pin the decision LAW: dropped ⇒ witnessed by a ≥ tau cosine,
    // kept-as-canonical ⇒ canon is the min id of its group. The planted-
    // pair tests above remain the exact-value pins.
    val out = graft.ops.LlmData.dedupSemantic(spark, sfDir)
    val rows = out.collect()
    val nVec = graft.ops.Util.t(spark, sfDir, "embeddings").count()
    assert(rows.length.toLong == nVec)
    // non-vacuous: multi-member cells produce real finite cosines
    val cos = rows.filter(!_.isNullAt(4)).map(_.getDouble(4))
    assert(cos.nonEmpty)
    assert(cos.forall(c => c >= -1.0 && c <= 1.0))
    rows.foreach { r =>
      val (id, canon, kept) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      if (kept) assert(canon == id)
      // dropped ⇒ a witness pair at or above tau existed in its cell
      else assert(canon < id && !r.isNullAt(4) &&
        r.getDouble(4) >= SemDedup.Tau - 1e-6)
    }
    // overflow is bounded observability, never negative
    assert(rows.forall(_.getLong(5) >= 0L))
  }

  test("cell overflow is observable: capped members surface in cell_overflow, never silently") {
    // six parallel copies in one cell, cap 4: ids 5 and 6 are past the
    // cap, generate no pairs, and come out kept — the overflow column
    // is what stops that truncation from reading as genuine uniqueness
    val a = rand(41)
    val rows = (1L to 6L).map(i => (i, copyOf(a, 1.0f + i * 0.01f), 0))
    val out = SemDedup.dedup(assigned(rows), "vec_id", "embedding", cap = 4)
      .collect()
    assert(out.forall(_.getLong(5) == 2L))
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L))
  }
}
