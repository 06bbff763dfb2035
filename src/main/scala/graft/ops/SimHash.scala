package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (Charikar, STOC 2002; used for web
  * dedup in Manku et al., WWW 2007 — public literature).
  *
  * Each document folds its token hashes into one 64-bit fingerprint:
  * bit b is 1 iff the sum over tokens of ±1 (sign = bit b of the
  * token's xxhash64) is positive. Near-duplicates differ in few bits,
  * so candidate generation is exact-match on 4 bands of 16 bits — by
  * pigeonhole, any pair within Hamming distance 3 agrees on at least
  * one band — then candidates are verified with an exact popcount of
  * the XOR. Everything is built-in codegen'd expressions: xxhash64,
  * bit ops, 64 conditional-sum aggregate columns, one shuffle per agg.
  *
  * Scale: fingerprints are 8 bytes/doc; the band shuffle key is
  * (band_id, 16-bit slice), so bucket population tracks genuine
  * similarity. Verification is O(1) per candidate pair (single XOR +
  * popcount) — unlike MinHash there is no set intersection to compute.
  */
object SimHash {
  val Bits = 64
  val Bands = 4
  val BitsPerBand = 16

  /** 64-bit SimHash per id from (id, token) rows: one row per id with a
    * `simhash` LongType column. */
  def fingerprints(rows: DataFrame, idCol: String, tokCol: String): DataFrame = {
    val hashed = rows.select(col(idCol), xxhash64(col(tokCol)).as("h"))
    val bitSums = (0 until Bits).map { b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1).otherwise(-1)).as(s"bs_$b")
    }
    val fp = (0 until Bits).map { b =>
      when(col(s"bs_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    hashed.groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), fp.as("simhash"))
  }

  /** Per-row fingerprint path: the native
    * [[graft.functions.SimHashFp]] expression folds each doc's
    * fingerprint in one fused loop — no token explode, no aggregate,
    * no shuffle before banding. Output schema identical to
    * [[fingerprints]]; bit-for-bit equality is pinned in
    * `SimHashSpec` (integer counter sums are commutative — exact, not
    * approximate). */
  def fingerprintsFromText(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
      graft.functions.SimHashFp(col(textCol)).as("simhash"))

  /** [[nearDupPairs]] through the per-row fingerprint path. */
  def nearDupPairsFromText(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame =
    candidatePairs(fingerprintsFromText(df, idCol, textCol), idCol)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))

  /** 16-bit band slice b of the simhash column. */
  private def bandSlice(b: Int): Column =
    expr(s"(simhash >> ${b * BitsPerBand}) & 65535")

  /** Candidate pairs (id_a < id_b) agreeing on ≥1 of the 4 bands —
    * complete for Hamming distance ≤ 3 by pigeonhole (among uncapped
    * bucket members; see [[Buckets.members]] for the skew cap). Same
    * capped-bucket expansion as MinHash (no skewed self-join); each id
    * carries its fingerprint so verification is join-free. */
  def candidatePairs(fps: DataFrame, idCol: String,
      cap: Int = Buckets.MaxBucket): DataFrame = {
    val banded = fps.select(col(idCol).as("id"), col("simhash"),
        explode(array((0 until Bands).map(b =>
          struct(lit(b).as("band_id"),
            bandSlice(b).as("band_val"))): _*)).as("band"))
      .select(col("id"), col("simhash"), col("band.band_id"), col("band.band_val"))
    Buckets.members(banded, Seq("band_id", "band_val"),
        col("id"), struct(col("id"), col("simhash")), cap)
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a.id").as("doc_a"), col("p.a.simhash").as("fp_a"),
        col("p.b.id").as("doc_b"), col("p.b.simhash").as("fp_b"))
      .distinct()
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist over (id, token)
    * rows. */
  def nearDupPairs(rows: DataFrame, idCol: String, tokCol: String,
      maxDist: Int = 3): DataFrame =
    candidatePairs(fingerprints(rows, idCol, tokCol), idCol)
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
}
