package graft

import org.apache.spark.sql.functions._
import graft.ops.SimHash

/** SimHash fingerprints + banded Hamming candidate generation. */
class SimHashSpec extends SparkTestBase {

  private def tokRows(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
  }

  test("identical documents get identical fingerprints (distance 0)") {
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val out = SimHash.nearDupPairs(
      tokRows(Seq(1L -> text, 2L -> text)), "doc_id", "token")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 0)))
  }

  test("near-identical documents pair within the Hamming budget; unrelated do not") {
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 3000).map(i => s"t$i")
    val base = (0 until 80).map(_ => vocab(rnd.nextInt(vocab.size)))
    val nearDup = base.updated(40, "CHANGED")
    val distract = (3L until 20L).map(i =>
      i -> (0 until 80).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = Seq(1L -> base.mkString(" "), 2L -> nearDup.mkString(" ")) ++ distract
    val pairs = SimHash.nearDupPairs(tokRows(docs), "doc_id", "token")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)),
      "a 1-token-of-80 edit perturbs few fingerprint bits")
    assert(pairs == Set((1L, 2L)), s"unexpected pairs: ${pairs - ((1L, 2L))}")
  }

  test("fingerprints are deterministic") {
    val docs = Seq(1L -> "one two three four five", 2L -> "six seven eight nine ten")
    val a = SimHash.fingerprints(tokRows(docs), "doc_id", "token")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    val b = SimHash.fingerprints(tokRows(docs), "doc_id", "token")
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
  }

  test("native per-row fingerprints equal the row-based aggregate bit-for-bit") {
    import spark.implicits._
    // the EXACTNESS contract of graft.functions.SimHashFp: same
    // split/xxhash64 primitives, commutative integer counter sums,
    // identical zero-counter tie rule — including empty text (one
    // empty token), repeated tokens, and double spaces
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 500).map(i => s"w$i")
    val docs = ((1L to 40L).map(i =>
        i -> (0 until 50).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq(100L -> "", 101L -> "a  b", 102L -> "x x x", 103L -> "solo"))
      .toDF("doc_id", "text")
    val agg = SimHash.fingerprints(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token")),
        "doc_id", "token")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = SimHash.fingerprintsFromText(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(perRow == agg)
    assert(agg.size == 44)
  }

  test("native fingerprints match on randomized multibyte unicode text") {
    import spark.implicits._
    // xxhash64 runs over UTF-8 BYTES — multibyte codepoints are where
    // a byte-offset/length bug in the native kernel would diverge
    val rnd = new scala.util.Random(19)
    val cps = ("αβγδε中文字象형글ñüé😀𝕏" + "abcxyz").codePoints().toArray
    def word() = Array.fill(1 + rnd.nextInt(4))(cps(rnd.nextInt(cps.length)))
      .flatMap(Character.toChars).mkString
    val docs = (1L to 30L).map(i =>
      i -> (0 until 25).map(_ => word()).mkString(" ")).toDF("doc_id", "text")
    val agg = SimHash.fingerprints(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("token")),
        "doc_id", "token")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = SimHash.fingerprintsFromText(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(perRow == agg)
    assert(agg.size == 30)
  }

  test("dedup_simhash query runs; every pair respects the Hamming bound") {
    val out = ops.LlmData.dedupSimhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.forall(p => p._3 <= 3 && p._1 < p._2))
  }
}
