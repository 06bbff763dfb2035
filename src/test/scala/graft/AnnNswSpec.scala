package graft

import graft.ops.AnnNsw
import org.apache.spark.sql.functions._

/** NSW graph-probe ANN: the proximity graph obeys its out-degree
  * bound, the beam search finds a planted duplicate, repeated searches
  * are deterministic, and the fixture query behaves. */
class AnnNswSpec extends SparkTestBase {

  private def vecsDf(vs: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private def randomVecs(n: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(64)(rnd.nextGaussian().toFloat))
  }

  private def tmpSource(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_nsw_").toString
    df.write.mode("overwrite").parquet(s"$dir/corpus.parquet")
    s"$dir/corpus"
  }

  test("the committed adjacency respects the out-degree bound M and " +
      "never self-loops") {
    val vs = randomVecs(120, 11)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val dir = AnnNsw.ensureGraph(spark, df, "vec_id", "embedding",
      tmpSource(df))
    val adj = spark.read.parquet(s"$dir/adjacency")
    assert(adj.filter(col("src") === col("dst")).isEmpty)
    val maxDeg = adj.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= AnnNsw.M, s"out-degree $maxDeg exceeds M=${AnnNsw.M}")
    // entries: at most one per cell, all real node ids
    val entries = spark.read.parquet(s"$dir/entries")
      .collect().map(_.getLong(0)).toSeq
    assert(entries.nonEmpty && entries.size <= graft.ops.AnnIvf.K)
    assert(entries.forall(e => e >= 0 && e < 120))
  }

  test("a planted scaled copy of the query is hit #1 with cosine 1") {
    val q = randomVecs(1, 21).head
    val copy = q.map(_ * 1.0005f)
    val noise = randomVecs(100, 22)
    val df = vecsDf(Seq(0L -> q, 1L -> copy) ++
      noise.zipWithIndex.map { case (v, i) => (10L + i) -> v })
    val dir = AnnNsw.ensureGraph(spark, df, "vec_id", "embedding",
      tmpSource(df))
    val top = AnnNsw.searchTopK(spark, dir, df, "vec_id", "embedding",
      q, 5, excludeId = Some(0L)).collect()
    assert(top.nonEmpty)
    assert(top.head.getLong(0) == 1L,
      s"planted duplicate must lead, got ${top.toSeq}")
    assert(top.head.getDouble(1) == 1.0)
    assert(top.forall(_.getLong(0) != 0L), "the query must exclude itself")
  }

  test("repeated searches over the same committed graph are " +
      "row-identical (deterministic beam)") {
    val vs = randomVecs(150, 31)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val dir = AnnNsw.ensureGraph(spark, df, "vec_id", "embedding",
      tmpSource(df))
    val q = vs.head
    val a = AnnNsw.searchTopK(spark, dir, df, "vec_id", "embedding",
      q, 5, excludeId = Some(0L)).collect().toSeq
    val b = AnnNsw.searchTopK(spark, dir, df, "vec_id", "embedding",
      q, 5, excludeId = Some(0L)).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("sim_nsw_topk query executes on the fixture corpus") {
    val out = ops.LlmData.simNswTopk(spark, sfDir).collect()
    assert(out.length <= 5 && out.nonEmpty)
    assert(out.forall(_.getLong(0) != 0L))
    assert(out.forall(r => r.getDouble(1) >= -1.0 && r.getDouble(1) <= 1.0))
    // scores arrive sorted descending, fully tie-broken
    val scores = out.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
  test("HNSW: every layer-l edge joins two level>=l members; degrees " +
      "bounded; the entry is the top layer's min id (K79)") {
    import graft.ops.AnnHnsw
    val vs = randomVecs(600, 31)
    val df = vecsDf(vs.zipWithIndex.map { case (v, i) => i.toLong -> v })
    val dir = AnnHnsw.ensureIndex(spark, df, "vec_id", "embedding",
      tmpSource(df))
    val layers = spark.read.parquet(s"$dir/layers")
      .select(col("src"), col("dst"), col("layer").cast("int").as("layer"))
    def lvl(id: Long): Int =
      if (id % 256 == 0) 2 else if (id % 16 == 0) 1 else 0
    layers.collect().foreach { r =>
      val (src, dst, l) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(src != dst)
      assert(lvl(src) >= l && lvl(dst) >= l,
        s"layer $l edge ($src,$dst) touches a lower-level node")
    }
    val maxDeg = layers.groupBy(col("layer"), col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= AnnNsw.M)
    val entry = spark.read.parquet(s"$dir/entry").head().getLong(0)
    assert(entry == 0L, "min id of the level-2 subsample (0,256,512)")
  }

  test("HNSW batch probe: batch(q) is row-identical to the sequential " +
      "driver walk for every query (K87)") {
    import graft.ops.{AnnHnsw, AnnNsw}
    val vs = randomVecs(400, 53)
    val pairs = vs.zipWithIndex.map { case (v, i) => i.toLong -> v }
    val df = vecsDf(pairs)
    val dir = AnnHnsw.ensureIndex(spark, df, "vec_id", "embedding",
      tmpSource(df))
    val qids = Seq(0L, 97L, 194L, 291L)
    val queries = df.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val batch = AnnHnsw.searchTopKBatch(spark, dir, df, "vec_id",
        "embedding", queries, 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    for (qid <- qids) {
      val seqWalk = AnnHnsw.searchTopK(spark, dir, df, "vec_id",
          "embedding", pairs(qid.toInt)._2, 5, excludeId = Some(qid))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == seqWalk,
        s"batch and sequential walks diverged for q=$qid: " +
          s"${batch(qid)} vs $seqWalk")
    }
    // job-count independence is structural (hops, not queries): the
    // batch result covers every query in one pool — sanity: all
    // queries answered with k rows
    assert(batch.keySet == qids.toSet)
    assert(batch.values.forall(_.length == 5))
  }

  test("HNSW incremental insert: empty batch reproduces the base index " +
      "bit-for-bit; inserts are deterministic, bounded, and every new " +
      "node is wired in (K89)") {
    import graft.ops.{AnnHnsw, AnnNsw}
    val vs = randomVecs(600, 71)
    val pairs = vs.zipWithIndex.map { case (v, i) => i.toLong -> v }
    val df = vecsDf(pairs)
    val isNew = col("vec_id") % 10 === 7 // level-0-only batch ids
    val base = df.filter(!isNew)
    val batch = df.filter(isNew)
    val dir = AnnHnsw.ensureIndex(spark, base, "vec_id", "embedding",
      tmpSource(base))
    val baseLayers = spark.read.parquet(s"$dir/layers")
      .select(col("layer"), col("src"), col("dst"))
    def snap(l: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
      l.select(col("src"), col("dst"), col("layer").cast("int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // law 1: EMPTY batch is the identity — the top rebuild is
    // deterministic over identical membership and every other layer
    // carries over verbatim
    val (idLayers, idEntry) = AnnHnsw.insertBatch(spark, baseLayers,
      base, batch.limit(0), "vec_id", "embedding")
    assert(snap(idLayers) == snap(baseLayers),
      "empty-batch insert must reproduce the base index exactly")
    assert(idEntry.head().getLong(0) ==
      spark.read.parquet(s"$dir/entry").head().getLong(0))
    // law 2: determinism — the same insert twice yields the same index
    val (ins1, e1) = AnnHnsw.insertBatch(spark, baseLayers, base, batch,
      "vec_id", "embedding")
    val (ins2, _) = AnnHnsw.insertBatch(spark, baseLayers, base, batch,
      "vec_id", "embedding")
    val s1 = snap(ins1)
    assert(s1 == snap(ins2), "insertBatch must be deterministic")
    // law 3: every new node has layer-0 out-edges (wired in), degree
    // bounds hold everywhere, and layer membership respects levels
    val newIds = batch.collect().map(_.getLong(0)).toSet
    val srcs0 = ins1.filter(col("layer") === 0)
      .select(col("src")).collect().map(_.getLong(0)).toSet
    assert(newIds.subsetOf(srcs0),
      s"unwired new nodes: ${newIds -- srcs0}")
    val maxDeg = ins1.groupBy(col("layer"), col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= AnnNsw.M)
    def lvl(id: Long): Int =
      if (id % 256 == 0) 2 else if (id % 16 == 0) 1 else 0
    ins1.collect().foreach { r =>
      val (src, dst, l) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(lvl(src) >= l && lvl(dst) >= l,
        s"layer $l edge ($src,$dst) touches a lower-level node")
    }
    // law 4: untouched established nodes keep their adjacency verbatim
    val base0 = snap(baseLayers)
    val adopters = base0.collect { case (s, d, l)
      if !s1.contains((s, d, l)) => s }
    // any base edge that disappeared must belong to a node that
    // adopted a new neighbor (re-ranked top-M), never collateral
    for (a <- adopters)
      assert(s1.exists { case (s, d, _) => s == a && newIds.contains(d) },
        s"node $a lost an edge without adopting any new neighbor")
    assert(e1.head().getLong(0) == 0L)
  }

  test("probe job bound: warm NSW/HNSW point probes issue <= 1 + " +
      "layer-0 hops Spark jobs (r19 verdict #2)") {
    import graft.ops.{AnnHnsw, AnnNsw}
    // the r19 defect: searchTopK launched one filter+collect job per
    // beam hop per structure touched (~15 jobs per HNSW probe). The
    // bound now: upper descent driver-resident (0 jobs warm), one
    // pruned dstvec-carrying read per layer-0 hop, plus the returned
    // frame's own collect.
    val vs = randomVecs(500, 97)
    val pairs = vs.zipWithIndex.map { case (v, i) => i.toLong -> v }
    val df = vecsDf(pairs)
    val src = tmpSource(df)
    val dirN = AnnNsw.ensureGraph(spark, df, "vec_id", "embedding", src)
    val dirH = AnnHnsw.ensureIndex(spark, df, "vec_id", "embedding", src)
    val q = vs(1)
    def probeN(): Unit = { AnnNsw.searchTopK(spark, dirN, df, "vec_id",
      "embedding", q, 5).collect(); () }
    def probeH(): Unit = { AnnHnsw.searchTopK(spark, dirH, df, "vec_id",
      "embedding", q, 5).collect(); () }
    probeN(); probeH() // warm: entry/upper structures go resident
    def jobsOf(tag: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(tag, tag)
      try body finally spark.sparkContext.clearJobGroup()
      // the status tracker feeds from the async listener bus — poll
      // until the count is stable
      var n = -1; var same = 0
      while (same < 3) {
        val m = spark.sparkContext.statusTracker
          .getJobIdsForGroup(tag).length
        if (m == n) same += 1 else { same = 0; n = m }
        Thread.sleep(100)
      }
      n
    }
    val nJobs = jobsOf("nsw_probe")(probeN())
    val hJobs = jobsOf("hnsw_probe")(probeH())
    assert(nJobs <= 1 + AnnNsw.Hops,
      s"NSW warm probe ran $nJobs jobs (bound ${1 + AnnNsw.Hops})")
    assert(hJobs <= 1 + AnnNsw.Hops,
      s"HNSW warm probe ran $hJobs jobs (bound ${1 + AnnNsw.Hops}) — " +
        "the upper descent must stay driver-resident")
  }

  test("HNSW: a planted scaled copy of the query is hit #1 and the " +
      "search is deterministic (K79)") {
    import graft.ops.AnnHnsw
    val q = randomVecs(1, 41).head
    val copy = q.map(_ * 1.0005f)
    val noise = randomVecs(300, 42)
    val df = vecsDf(Seq(0L -> q, 1L -> copy) ++
      noise.zipWithIndex.map { case (v, i) => (10L + i) -> v })
    val dir = AnnHnsw.ensureIndex(spark, df, "vec_id", "embedding",
      tmpSource(df))
    def run() = AnnHnsw.searchTopK(spark, dir, df, "vec_id", "embedding",
      q, 5, excludeId = Some(0L)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = run(); val b = run()
    assert(a == b, "repeated searches must walk the identical path")
    assert(a.head._1 == 1L && a.head._2 == 1.0,
      s"planted duplicate must lead, got $a")
    assert(a.forall(_._1 != 0L))
  }

  test("layer-0 seed volume is O(n * cap * rounds), never within-cell " +
      "quadratic (r20 verdict #1)") {
    import graft.ops.AnnNsw.{Layer0BucketCap, Layer0Rounds}
    // one mega-cell, population > cap: the r20 scale-killer shape (a
    // FIXED 16-cell codebook makes cell population n/16, so the old
    // within-cell pairwise scored ~2.5e11 pairs at sf100)
    val n = 3 * Layer0BucketCap / 2 // 768: ceil(n/cap) = 2 sub-buckets
    val rnd = new scala.util.Random(51)
    val mega = vecsDf((0 until n).map(i =>
      i.toLong -> Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .withColumn("cell", lit(0))
    val scored = graft.ops.AnnNsw.candidateScores(mega, "vec_id",
      "embedding")
    val cnt = scored.count()
    assert(cnt <= n.toLong * Layer0BucketCap * Layer0Rounds,
      s"seed volume $cnt exceeds the n*cap*rounds bound " +
        s"${n.toLong * Layer0BucketCap * Layer0Rounds}")
    assert(cnt < n.toLong * (n - 1),
      s"seed volume $cnt reached the quadratic within-cell bound — " +
        "the sub-cell bucketing is not splitting")
    // the graph built over the bounded seed still obeys its laws
    val (adj, _) = graft.ops.AnnNsw.buildGraph(mega, "vec_id", "embedding")
    val maxDeg = adj.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxDeg <= AnnNsw.M)
    // when a cell fits one bucket, the seed is EXACTLY the old
    // within-cell pairwise — the fixture-identity guarantee
    val small = vecsDf((0 until 96).map(i =>
      i.toLong -> Seq.fill(4)(rnd.nextGaussian().toFloat)))
      .withColumn("cell", pmod(col("vec_id"), lit(3)).cast("int"))
    val smallCnt = graft.ops.AnnNsw.candidateScores(small, "vec_id",
      "embedding").count()
    assert(smallCnt == 96L * 31, // 3 cells x 32*31 ordered pairs
      s"single-bucket cells must reproduce full within-cell pairwise, " +
        s"got $smallCnt")
  }

}
