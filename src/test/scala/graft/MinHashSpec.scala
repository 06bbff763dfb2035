package graft

import org.apache.spark.sql.functions._
import graft.ops.MinHash

/** K2: banded MinHash LSH — planted near-duplicates must surface as
  * candidates and survive exact-Jaccard verification; unrelated
  * documents must not pair. */
class MinHashSpec extends SparkTestBase {

  // deterministic corpus: two near-identical docs + distractors drawn
  // from a large vocabulary (so random trigram overlap is ~0)
  private def corpus(): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 5000).map(i => s"w$i")
    val base = (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val nearDup = {
      val toks = base.split(" ").toVector
      toks.updated(30, "CHANGED").mkString(" ") // 1 token of 60 differs
    }
    val distractors = (2L until 30L).map { i =>
      i -> (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    Seq(0L -> base, 1L -> nearDup) ++ distractors
  }

  private def rowsDf() = {
    import spark.implicits._
    MinHash.shingleRows(corpus().toDF("doc_id", "text"), "doc_id", "text")
  }

  test("shingleRows emits n-2 trigram rows per n-token doc") {
    import spark.implicits._
    val rows = MinHash.shingleRows(
      Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(rows == Seq((1L, "a b c"), (1L, "b c d"), (3L, "p q r")))
  }

  test("signatures are deterministic and K columns wide") {
    val s1 = MinHash.signatures(rowsDf(), "doc_id")
    assert(s1.columns.length == MinHash.K + 1)
    val a = s1.orderBy("doc_id").collect().map(_.toSeq)
    val b = MinHash.signatures(rowsDf(), "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("native per-row signatures equal the row-based aggregate bit-for-bit") {
    import spark.implicits._
    // the EXACTNESS contract of graft.functions.MinHashSig: same
    // split/concat_ws/murmur3 primitives, same affine params, min over
    // the same integer multiset — any drift (tokenizer, seed, pmod)
    // breaks this, including on short docs (< 3 tokens must DROP, not
    // return a sentinel signature) and docs with repeated/empty tokens
    val docs = corpus().toDF("doc_id", "text")
      .union(Seq(
        (100L, "a b"),                // < 3 tokens: no signature
        (101L, "a  b c d"),           // double space: empty token
        (102L, "x x x x"),            // degenerate repeats
        (103L, "tail space c ")       // trailing empty token
      ).toDF("doc_id", "text"))
    val agg = MinHash.signatures(
        MinHash.shingleRows(docs, "doc_id", "text"), "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = MinHash.signaturesFromText(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(perRow == agg)
    assert(agg.nonEmpty)
    // and the candidate relation is identical through both paths
    val a = MinHash.candidatePairs(
        MinHash.shingleRows(docs, "doc_id", "text"), "doc_id")
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    val b = MinHash.candidatePairsFromText(docs, "doc_id", "text")
      .orderBy("doc_a", "doc_b").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("native signatures match on randomized multibyte unicode text") {
    import spark.implicits._
    // murmur3 runs over UTF-8 BYTES — multibyte codepoints are where a
    // byte-offset/length bug in the native kernel would diverge from
    // the SQL composition while pure-ASCII corpora stay green
    val rnd = new scala.util.Random(17)
    val alphabet = "αβγδε中文字象형글ñüé😀𝕏" + "abcxyz"
    val cps = alphabet.codePoints().toArray
    def word() = Array.fill(1 + rnd.nextInt(4))(cps(rnd.nextInt(cps.length)))
      .flatMap(Character.toChars).mkString
    val docs = (1L to 30L).map(i =>
      i -> (0 until 20).map(_ => word()).mkString(" ")).toDF("doc_id", "text")
    val agg = MinHash.signatures(
        MinHash.shingleRows(docs, "doc_id", "text"), "doc_id")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = MinHash.signaturesFromText(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(perRow == agg)
    assert(agg.size == 30)
  }

  test("planted near-dup pair is a candidate; distractors are not") {
    val cand = MinHash.candidatePairs(rowsDf(), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)),
      "a 1-token-of-60 edit (J≈0.9) must collide in at least one of 8 bands")
    // unrelated docs share no shingles → must not become candidates
    assert(cand.forall { case (a, b) => (a, b) == ((0L, 1L)) },
      s"unexpected candidate pairs: ${cand - ((0L, 1L))}")
  }

  test("identical documents always pair (J=1 collides in every band)") {
    import spark.implicits._
    val rows = MinHash.shingleRows(Seq(
      10L -> "alpha beta gamma delta epsilon zeta eta theta",
      11L -> "alpha beta gamma delta epsilon zeta eta theta",
      12L -> "totally different words here that never repeat at all")
      .toDF("doc_id", "text"), "doc_id", "text")
    val cand = MinHash.candidatePairs(rows, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand == Set((10L, 11L)))
  }

  test("dedup_minhash precision on the fixture corpus is exact") {
    // LSH only generates candidates — every emitted pair must genuinely
    // have Jaccard >= 0.5, with doc_a < doc_b and no duplicates
    val out = ops.LlmData.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._3 >= 0.5))
    assert(out.forall(p => p._1 < p._2))
    val pairs = out.map(p => (p._1, p._2))
    assert(pairs.distinct.length == pairs.length)
  }
}
