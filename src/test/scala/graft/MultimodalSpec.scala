package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload columns + partition-batched
  * (stubbed) decode with a typed schema. */
class MultimodalSpec extends SparkTestBase {

  test("decodeStub is deterministic and in range") {
    val m1 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val m2 = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    assert(m1 == m2)
    assert(m1.width >= 1 && m1.width <= 640)
    assert(m1.height >= 1 && m1.height <= 480)
    assert(Set("png", "jpeg", "webp").contains(m1.format))
  }

  test("withDecodedMeta yields one typed row per payload") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "defghij")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.withDecodedMeta(df).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.head.getInt(1) == 3 % 640 + 1) // width from byte length
    assert(out.head.getString(3) == Seq("png", "jpeg", "webp")(3 % 3))
  }

  test("featureStub emits a fixed-width deterministic vector") {
    val v = Multimodal.featureStub("abc".getBytes("UTF-8"))
    assert(v.length == 4)
    assert(v(0) == 3.0f && v(3) == 'a'.toFloat)
  }

  test("withFeatures bridges payload -> features -> cosine similarity") {
    import spark.implicits._
    val df = Seq((0L, "aaa"), (1L, "aaa"), (2L, "a much longer different text"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val feats = Multimodal.withFeatures(df)
    val q = feats.filter(col("doc_id") === 0)
      .select(col("features")).head().getSeq[Float](0)
    val out = feats.filter(col("doc_id") =!= 0)
      .select(col("doc_id"), graft.ops.AnnLsh.cosine(
        col("features").cast("array<double>"),
        array(q.map(lit): _*).cast("array<double>")).as("cos"))
      .orderBy(col("cos").desc, col("doc_id")).collect()
    // identical payload → identical stub features → cosine exactly 1
    assert(out.head.getLong(0) == 1L && out.head.getDouble(1) == 1.0)
  }

  test("resizeStub clamps to the bounding box preserving aspect ratio") {
    val m = Multimodal.MediaMeta(640, 480, "png")
    val r = Multimodal.resizeStub(m, 320)
    assert(r == Multimodal.MediaMeta(320, 240, "png"))
    // never upscale
    assert(Multimodal.resizeStub(Multimodal.MediaMeta(100, 50, "jpeg"), 320) ==
      Multimodal.MediaMeta(100, 50, "jpeg"))
    // degenerate dims stay >= 1
    assert(Multimodal.resizeStub(Multimodal.MediaMeta(1000, 1, "webp"), 10).height == 1)
  }

  test("withFrameSamples emits every 2nd frame index with per-frame hashes") {
    import spark.implicits._
    // payload of 5 bytes → n_frames = 5 % 16 + 1 = 6 → indices 0, 2, 4
    val df = Seq((1L, "abcde")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.withFrameSamples(df).orderBy("frame_idx").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(out.map(_.getString(2)).distinct.length == 3, "frame hashes differ")
  }

  test("resize plan clamps to the box, preserves aspect, leaves small media untouched (K50)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 50L).map(i => (i, "x" * (i * 37).toInt)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    for (r <- Multimodal.withResizePlan(df).collect()) {
      val (w, h, rw, rh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(rw >= 1 && rh >= 1 && rw <= 256 && rh <= 256)
      if (math.max(w, h) <= 256) assert(rw == w && rh == h)
      else {
        // the longer edge lands on the box (255 allowed: IEEE
        // (256/max)·max can round just below 256 before the floor)
        assert(math.max(rw, rh) <= 256 && math.max(rw, rh) >= 255)
        // aspect preserved: BOTH edges scale by the same factor (an
        // independent per-edge clamp would pass the bounds above)
        val s = math.min(1.0, 256.0 / math.max(w, h))
        assert(rw == math.max(1, (w * s).toInt))
        assert(rh == math.max(1, (h * s).toInt))
      }
    }
  }

  test("K60: asset dedup accounting conserves docs and byte mass") {
    val rows = graft.ops.LlmData.multimodalDedup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "every payload lands in exactly one format bucket")
    // distinct assets across formats == distinct payloads overall
    // (format is a function of the payload, so buckets never split
    // an asset)
    assert(rows.map(_.getLong(2)).sum ==
      docs.select(col("text")).distinct().count())
    for (r <- rows) {
      val (np, nd, dup) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dup == np - nd && nd >= 1)
      assert(r.getLong(5) <= r.getLong(4),
        "dedupable bytes cannot exceed total bytes")
    }
  }
}
