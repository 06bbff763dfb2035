package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K2: banded MinHash LSH for near-duplicate candidate generation.
  *
  * The scale-safe shape for near-dup detection at 100 TB: instead of
  * bucketing by a single min-shingle (whose most-common value forms one
  * giant skewed bucket → quadratic self-join blowup), each document gets
  * a k=32 MinHash signature split into 8 bands of 4 rows. Two documents
  * collide iff they agree on *all four* rows of *some* band, so bucket
  * population is driven by genuine similarity, not by one corpus-common
  * shingle. With k=32/b=8/r=4 the collision probability is
  * 1-(1-j^4)^8 — ≈0.96 at j=0.8, ≈0.19 at j=0.3 — the classic LSH
  * S-curve for a 0.5-0.7 Jaccard threshold (Leskovec, Rajaraman, Ullman,
  * "Mining of Massive Datasets" ch.3, public).
  *
  * Implementation is deliberately codegen-friendly: shingles are
  * exploded and each one Murmur3-hashed ONCE, then the 32 signature
  * rows are 32 `min(pmod(a_i*h+b_i, P))` columns of a single hash
  * aggregate — whole-stage codegen end to end, no interpreted
  * higher-order lambdas (an earlier HOF formulation cost ~60s per pass
  * at sf0.1; this shape is ~1s). Candidate pairs are generated from
  * `collect_list` buckets rather than a bucket self-join, so the
  * signature stage is computed exactly once, and LSH affects recall
  * only — every candidate is verified with exact Jaccard downstream.
  *
  * Mirrors the dedup surface the reference delegates to its warehouse
  * (SURVEY.md §2.2 K2); unit-tested with planted near-duplicates in
  * `graft.MinHashSpec`.
  */
object MinHash {
  /** Signature length (shared with the native
    * [[graft.functions.MinHashSig]] per-row expression). */
  val K: Int = graft.functions.MinHashSig.K
  /** Bands × rows-per-band factorization of K. */
  val Bands = 8
  val RowsPerBand = 4
  /** Mersenne prime 2^61-1: (a*h+b) mod P stays exact in Long arithmetic
    * (|h| < 2^32, a,b < 2^31 → |a*h+b| < 2^63). */
  val P: Long = graft.functions.MinHashSig.P

  /** Fixed-seed affine hash parameters — deterministic across JVMs;
    * the single source shared with [[graft.functions.MinHashSig]]. */
  private val (as, bs): (Array[Long], Array[Long]) =
    (graft.functions.MinHashSig.as, graft.functions.MinHashSig.bs)

  /** Token 3-gram shingle rows (NOT distinct) of a whitespace-tokenized
    * text column: one (id, shingle) row per trigram window. Built with
    * posexplode + O(1) element_at lookups — narrow and fully
    * whole-stage-codegen'd. (A higher-order transform building the
    * shingle array per row is interpreted expression eval and measured
    * ~10s for 5000 docs at sf0.1; this shape is sub-second.) Shared by
    * the Jaccard and MinHash dedup paths; docs with < 3 tokens emit no
    * rows. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"), posexplode(col("toks")))
      .filter(col("pos") <= size(col("toks")) - 3)
      .select(col(idCol), concat_ws(" ",
        col("col"),
        element_at(col("toks"), col("pos") + 2),
        element_at(col("toks"), col("pos") + 3)).as("shingle"))

  /** Distinct shingle set per id, plus the min shingle (the k=1 LSH
    * bucket of the Jaccard variant). collect_set makes the set exact;
    * min over non-distinct rows equals min over the set. */
  def shingleSets(rows: DataFrame, idCol: String): DataFrame =
    rows.groupBy(col(idCol)).agg(
      collect_set(col("shingle")).as("shingles"),
      min(col("shingle")).as("bucket"))

  /** MinHash signatures from (id, shingle) rows: one row per id with
    * columns sig_0..sig_{K-1}. Each shingle is Murmur3-hashed once; the
    * 32 signature rows are plain min-aggregate columns (map-side partial
    * min, one shuffle on the id). Duplicate shingle rows cannot change a
    * minimum, so no distinct is needed. */
  def signatures(rows: DataFrame, idCol: String): DataFrame = {
    val hashed = rows.select(col(idCol), hash(col("shingle")).cast("long").as("h"))
    val sigCols = (0 until K).map { i =>
      min(pmod(col("h") * lit(as(i)) + lit(bs(i)), lit(P))).as(s"sig_$i")
    }
    hashed.groupBy(col(idCol)).agg(sigCols.head, sigCols.tail: _*)
  }

  /** (band_id, band_hash) rows per id — the LSH bucket key. band_hash
    * folds the band's signature rows with murmur3. */
  def banded(sigs: DataFrame, idCol: String): DataFrame = {
    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band_id"),
        hash((0 until RowsPerBand)
          .map(r => col(s"sig_${b * RowsPerBand + r}")): _*).as("band_hash"))
    }: _*)
    sigs
      .withColumn("band", explode(bandStructs))
      .select(col(idCol), col("band.band_id"), col("band.band_hash"))
  }

  /** Skew-capped LSH buckets over (id, shingle) rows: (band_id,
    * band_hash, ids, n_overflow) with at most `cap` members per bucket
    * — see [[Buckets.members]] for the adversarial-corpus rationale
    * (millions of identical docs would otherwise build one giant
    * bucket row and a quadratic pair expansion). */
  def buckets(rows: DataFrame, idCol: String,
      cap: Int = Buckets.MaxBucket): DataFrame =
    Buckets.members(banded(signatures(rows, idCol), idCol),
      Seq("band_id", "band_hash"), col(idCol), col(idCol), cap)

  /** Per-row signature path: the native [[graft.functions.MinHashSig]]
    * expression computes each doc's full K-column signature in one
    * fused loop — no shingle explode, no aggregate, no shuffle before
    * banding. Output schema identical to [[signatures]] (sig_0..sig_31
    * per id); docs with < 3 tokens drop, exactly like the agg path.
    * Row-for-row equality with the row-based path is pinned in
    * `MinHashSpec` (min over the same integer multiset — bit-exact,
    * not approximate). */
  def signaturesFromText(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df
      // the kernel's only NULL case is < 3 tokens (no shingles); gate
      // on the cheap token count rather than `__sig IS NOT NULL` — the
      // optimizer pushes the filter below the signature projection by
      // SUBSTITUTING the expression, which would evaluate the whole
      // kernel twice per row (seen in the executed plan)
      .filter(size(split(col(textCol), " ", -1)) >= 3)
      .select(col(idCol),
        graft.functions.MinHashSig(col(textCol)).as("__sig"))
      .select(col(idCol) +:
        (0 until K).map(i => col("__sig").getItem(i).as(s"sig_$i")): _*)

  /** [[buckets]] through the per-row signature path. */
  def bucketsFromText(df: DataFrame, idCol: String, textCol: String,
      cap: Int = Buckets.MaxBucket): DataFrame =
    Buckets.members(banded(signaturesFromText(df, idCol, textCol), idCol),
      Seq("band_id", "band_hash"), col(idCol), col(idCol), cap)

  /** [[candidatePairs]] through the per-row signature path. */
  def candidatePairsFromText(df: DataFrame, idCol: String, textCol: String,
      cap: Int = Buckets.MaxBucket): DataFrame =
    bucketsFromText(df, idCol, textCol, cap)
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()

  /** Candidate pairs (doc_a < doc_b) from banded LSH over (id, shingle)
    * rows. One shuffle to the signature agg, one to the bucket agg;
    * pairs are produced by expanding each bucket's sorted, skew-capped
    * id list (buckets are similarity-driven and small — no skewed
    * self-join) and distinct-ed so a pair colliding in several bands is
    * verified once. */
  def candidatePairs(rows: DataFrame, idCol: String,
      cap: Int = Buckets.MaxBucket): DataFrame =
    buckets(rows, idCol, cap)
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
}
