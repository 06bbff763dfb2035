package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Util._

/** Category K — LLM-training-data operators over `documents` /
  * `embeddings` (SURVEY.md §2.2 K1-K5 + the training-pipeline extensions
  * the driver's north star calls for: fingerprinting, Jaccard near-dup,
  * quality scoring, binary-payload plumbing).
  *
  * Scale shapes: exact dedup is hash-partition + window (no all-pairs);
  * Jaccard near-dup generates candidates only within a min-shingle bucket
  * (a k=1 identity-hash MinHash band — the LSH family that
  * [[graft.ops.MinHash]] generalizes to k=32 banded); cosine top-k
  * broadcasts the single query vector and does one narrow pass +
  * TakeOrderedAndProject — never a crossJoin.
  */
object LlmData {

  /** K1: exact dedup — sha2 text hash, keep the minimum doc_id per hash.
    * One shuffle on the hash; survivors ordered by doc_id. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("text_sha")).orderBy(col("doc_id"))
    t(spark, sfDir, "documents")
      .select(col("doc_id"), sha2(col("text"), 256).as("text_sha"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text_sha"))
      .orderBy(col("doc_id"))
  }

  private val D = DecimalType(18, 9)
  private val ACC = DecimalType(38, 18)

  /** Exact-decimal dot product of two float-array columns: each float is
    * correctly-rounded to DECIMAL(18,9), products summed exactly — the
    * only float ops left (sqrt, divide, multiply) are IEEE
    * correctly-rounded, so Spark and DuckDB produce bit-identical
    * cosines. */
  private def decDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(D) * y.cast(D)),
      lit(0).cast(ACC), (acc, x) => acc + x)
      .cast("double")

  /** K3: brute-force cosine top-5 neighbors of vec_id=0. The query vector
    * is collected (one row) and inlined as a literal — at cluster scale
    * this is a broadcast; candidates stream through a narrow map and a
    * TakeOrderedAndProject. No crossJoin. */
  def simTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val q: Seq[Float] = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val qCol = array(q.map(lit): _*)
    val qNorm2 = emb.sparkSession.range(1)
      .select(decDot(array(q.map(lit): _*), array(q.map(lit): _*)))
      .head().getDouble(0)
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        decDot(col("embedding"), qCol).as("dot"),
        decDot(col("embedding"), col("embedding")).as("n2"))
      .select(col("vec_id"),
        round(col("dot") / (sqrt(col("n2")) * sqrt(lit(qNorm2))), 6)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(5)
  }

  /** K4: corpus stats per language. */
  def textStats(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        dbl(sum(dec(size(split(col("text"), " ")))) / count(lit(1)))
          .as("avg_tokens"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** K5: top-10 tokens by corpus frequency (explode → partial-agg count →
    * TakeOrdered; the map-side combine bounds the shuffle). */
  def textTokensTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(10)

  /** Fingerprint: sha256 over the sorted distinct token set — a
    * canonical-form hash robust to token order (bag-of-words identity). */
  def textFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        sha2(array_join(array_sort(array_distinct(split(col("text"), " "))), " "),
          256).as("fp"))
      .orderBy(col("doc_id"))

  /** Quality scoring per document: token count, mean token length, and
    * stopword ratio (exact decimal ratios, DOUBLE finals). */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is")
    t(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        dbl(dec(length(col("text")) - (size(col("toks")) - 1))
          / size(col("toks"))).as("avg_tok_len"),
        dbl(dec(size(filter(col("toks"),
            tk => tk.isin(stop.map(s => s: Any): _*))))
          / size(col("toks"))).as("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup detection: token-trigram shingles, candidates bucketed by
    * min-shingle (k=1 identity-hash MinHash band — no all-pairs), Jaccard
    * ≥ 0.5 on distinct-shingle sets. The k=32 banded generalization is
    * [[MinHash]] (unit-tested). */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))).as("shingles"))
      .withColumn("bucket", array_min(col("shingles")))
    val a = docs.select(col("bucket"), col("doc_id").as("doc_a"),
      col("shingles").as("sh_a"))
    val b = docs.select(col("bucket"), col("doc_id").as("doc_b"),
      col("shingles").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("n_int", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("n_union",
        size(col("sh_a")) + size(col("sh_b")) - col("n_int"))
      .withColumn("jaccard", dbl(dec(col("n_int")) / col("n_union")))
      .filter(col("jaccard") >= 0.5d)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Multimodal plumbing: opaque binary payload column + typed metadata —
    * byte length and content hash computed on the binary, the pattern an
    * image/audio pipeline uses before a decode UDF (decode itself is
    * stubbed in [[graft.multimodal.Multimodal]]). */
  def multimodalBinaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"))
      .orderBy(col("doc_id"))
}
