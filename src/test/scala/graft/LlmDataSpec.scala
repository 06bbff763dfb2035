package graft

import graft.ops.LlmData

/** Policy tests for the LLM-data ops that the oracle fixture cannot
  * exercise (its columns are never NULL). */
class LlmDataSpec extends SparkTestBase {

  test("contamination screen includes NULL-source documents (K23)") {
    import spark.implicits._
    // round-6 verdict #5: `source =!= 'src0'` is NULL-unsafe, so a
    // NULL-source document sharing benchmark shingles silently escaped
    // screening. NULL source must be treated as a candidate.
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon", "src0"),
      (1L, "alpha beta gamma delta zeta", "src1"),
      (2L, "alpha beta gamma delta eta", null)
    ).toDF("doc_id", "text", "source")
    val hits = LlmData.contaminationScreen(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // both non-benchmark docs share the trigrams "alpha beta gamma"
    // and "beta gamma delta" with the src0 doc
    assert(hits == Map(1L -> 2L, 2L -> 2L))
  }

  test("dedup_substring counts duplicated 16-token spans exactly (K32)") {
    import spark.implicits._
    val a = (0 until 20).map(i => s"a$i")
    val docs = Seq(
      (0L, a.mkString(" ")),                                  // 5 spans
      (1L, a.mkString(" ")),                                  // exact dup of 0
      (2L, (a.drop(4) ++ Seq("c0", "c1", "c2", "c3")).mkString(" ")),
      // ^ span at pos 0 = a4..a19 = doc 0's span at pos 4 — 1 of 5 dup
      (3L, a.take(10).mkString(" "))                          // below window
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_k32_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = LlmData.dedupSubstring(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.toString))))
      .toMap
    assert(got(0L) == ((5L, 5L, Some("1.0"))))
    assert(got(1L) == ((5L, 5L, Some("1.0"))))
    assert(got(2L) == ((5L, 1L, Some("0.2"))))
    assert(got(3L) == ((0L, 0L, None)))
  }

  test("text_pii_scrub redacts every match and counts deterministically (K35)") {
    import spark.implicits._
    val rows = LlmData.textPiiScrub(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // the synthetic injection is a pure function of doc_id
    for ((id, (nEmails, nIps, _)) <- rows) {
      assert(nEmails >= (if (id % 7 == 0) 1L else 0L), s"doc $id emails")
      assert(nIps >= (if (id % 11 == 0) 1L else 0L), s"doc $id ips")
    }
    assert(rows.exists(_._2._1 > 0) && rows.exists(_._2._2 > 0))
    // scrubbing is complete: re-scrubbing a scrubbed text changes
    // nothing — verified on a hand-built adversarial doc
    // doc_id 1 gets NO synthetic injection (1 % 7 != 0, 1 % 11 != 0)
    val doc = Seq((1L, "a@b.co x 1.2.3.4 y z@w.org 10.20.30.40"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.lit(38L))
    val dir = java.nio.file.Files.createTempDirectory("graft_k35_").toString
    doc.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = LlmData.textPiiScrub(spark, dir).collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L, r.toString)
  }

  test("dedup_keep_best picks the longest member, smallest id on ties (K34)") {
    val clusters = LlmData.dedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    val chars = graft.ops.Util.t(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = LlmData.dedupKeepBest(spark, sfDir).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (cid, kept, n, bytes) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val members = byCluster(cid)
      assert(members.contains(kept), s"cluster $cid keeps a non-member")
      assert(n == members.size)
      assert(bytes == members.toSeq.map(chars).sum)
      // kept is the argmax of (n_chars, -doc_id)
      val best = members.toSeq.map(m => (chars(m), -m)).max
      assert((chars(kept), -kept) == best, s"cluster $cid kept $kept")
    }
  }

  test("corpus_shard conserves docs and token mass across shards (K31)") {
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    val nDocs = docs.count()
    val nToks = docs.selectExpr("CAST(size(split(text, ' ')) AS LONG) t")
      .agg(org.apache.spark.sql.functions.sum("t")).collect()(0).getLong(0)
    val rows = LlmData.corpusShard(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    assert(rows.map(_.getLong(2)).sum == nToks)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
  }

  test("containment pairs are a superset of the Jaccard pairs (K41)") {
    // C(X in Y) ≥ J(X,Y) always, and both ops share the min-shingle
    // candidate generator — so every K6 pair at J ≥ 0.5 must reappear
    // in the containment output at max(c_ab, c_ba) ≥ 0.5
    val jac = LlmData.dedupNgramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val con = LlmData.dedupContainment(spark, sfDir).collect()
    val conPairs = con.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jac.subsetOf(conPairs),
      s"missing pairs: ${jac -- conPairs}")
    con.foreach { r =>
      val (a, b, cab, cba, contained) =
        (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getLong(5))
      assert(cab > 0 && cab <= 1.0 && cba > 0 && cba <= 1.0)
      assert(math.max(cab, cba) >= 0.5)
      // contained_doc is the more-contained side
      assert(contained == (if (cab >= cba) a else b))
    }
  }

  test("containment flags a subsumed doc that Jaccard misses (K41)") {
    import spark.implicits._
    // short doc fully inside a long one: containment 1.0 but union is
    // dominated by the long side, J < 0.5 — the pair the asymmetric
    // measure exists for. Shared min-shingle: "a00 ..." sorts first.
    val short0 = (0 until 6).map(i => f"a$i%02d")
    val long0 = short0 ++ (0 until 20).map(i => f"z$i%02d")
    val docs = Seq(
      (0L, long0.mkString(" ")), (1L, short0.mkString(" "))
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_k41_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = LlmData.dedupContainment(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    // 4 shingles of doc 1, all present in doc 0's 24 → c_ba = 1.0
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getDouble(4) == 1.0 && r.getDouble(3) < 0.5)
    assert(r.getLong(5) == 1L) // the short doc is the contained one
    // and Jaccard at 4/24 would never have kept this pair
    assert(LlmData.dedupNgramJaccard(spark, dir).collect().isEmpty)
  }

  test("reservoir keeps exactly the k smallest priorities (K42)") {
    import org.apache.spark.sql.functions._
    val out = LlmData.sampleReservoir(spark, sfDir).collect()
    assert(out.length == 100)
    val kept = out.map(_.getLong(0)).toSet
    // recompute every doc's draw; the selected set must be exactly the
    // 100 smallest (priority, doc_id)
    val all = graft.ops.Util.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(concat('res', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS LONG)")
          .as("p"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.take(100)
      .map(_._2).toSet
    assert(kept == all)
  }

  test("corpus_mix keeps within availability and caps thresholds (K43)") {
    val rows = LlmData.corpusMix(spark, sfDir).collect()
    assert(rows.length == 5)
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    val total = docs.count()
    rows.foreach { r =>
      val (nDocs, nTarget, nKept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nDocs)
      assert(nTarget > 0)
      // a language short of its target keeps everything (threshold cap)
      if (nTarget >= nDocs) assert(nKept == nDocs)
    }
    // Σ targets never exceeds the half-corpus budget (floor rounding)
    assert(rows.map(_.getLong(2)).sum <= total / 2)
  }

  test("holdout split partitions the corpus exactly (K44)") {
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    val rows = LlmData.splitHoldout(spark, sfDir).collect()
    // disjoint + exhaustive: split totals sum back to the corpus
    assert(rows.map(_.getLong(2)).sum == docs.count())
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    // train dominates (97% expected share; generous band for sf0.001)
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit("train") > bySplit.getOrElse("val", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("embedding_stats norms are consistent and exhaustive (K45)") {
    val rows = LlmData.embeddingStats(spark, sfDir).collect()
    val total = graft.ops.Util.t(spark, sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum == total, "every vector is counted")
    rows.foreach { r =>
      val (mean, mn, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn > 0, "collapsed (zero-norm) vectors would alarm here")
      assert(mn <= mean && mean <= mx, s"label ${r.getInt(0)}: $mn <= $mean <= $mx")
    }
    // brute-force cross-check one label's mean norm
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val l0 = graft.ops.Util.t(spark, sfDir, "embeddings")
      .filter(col("label") === rows.head.getInt(0))
      .select(col("embedding")).as[Seq[Float]].collect()
    val brute = l0.map(v =>
      math.sqrt(v.map(f => f.toDouble * f.toDouble).sum)).sum / l0.length
    assert(math.abs(rows.head.getDouble(2) - brute) < 1e-4,
      s"mean norm ${rows.head.getDouble(2)} vs brute $brute")
  }

  test("bigram surprisal ranks rare transitions above rote text (K47)") {
    import spark.implicits._
    // ten copies of the same sentence establish common transitions; a
    // scrambled permutation of the SAME words has transitions seen
    // once — the case unigram surprisal (K40) cannot distinguish,
    // since both docs have identical token frequencies
    val rote = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox the brown jumps"
    val docs = ((1L to 10L).map(i => (i, rote)) :+ (11L, scrambled))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_k47_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = LlmData.textSurprisalBigram(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == 11)
    val roteS = out(1L).getDouble(2)
    val scrS = out(11L).getDouble(2)
    assert(out.values.forall(_.getLong(1) == 8L))
    assert(scrS > roteS,
      s"scrambled transitions ($scrS) must out-surprise rote text ($roteS)")
    // a short doc reports 0 bigrams, NULL surprisal
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft_k47b_").toString
    one.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r1 = LlmData.textSurprisalBigram(spark, dir2).collect()(0)
    assert(r1.getLong(1) == 0L && r1.isNullAt(2))
  }

  test("quality-weighted sampling realizes its per-tier rates (K46)") {
    val rows = LlmData.sampleQualityWeighted(spark, sfDir).collect()
    val tiers = rows.map(_.getInt(0)).toSet
    assert(tiers.subsetOf(Set(300, 500, 800, 1000)))
    val total = graft.ops.Util.t(spark, sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total, "every doc lands in a tier")
    rows.foreach { r =>
      val (pm, n, kept, rate) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(kept <= n)
      // a pm=1000 tier keeps EVERYTHING by construction (draw < 1000)
      if (pm == 1000) assert(kept == n)
      // realized rate within a 4-sigma binomial band of the target
      val p = pm / 1000.0
      val sigma = math.sqrt(p * (1 - p) / n)
      assert(math.abs(rate - p) <= 4 * sigma + 1.0 / n,
        s"tier $pm: rate $rate vs target $p (n=$n)")
    }
  }

  test("corpus_mix threshold survives the 2^31-target overflow regime (K43)") {
    import spark.implicits._
    // n_target = 3e9 (≥ 2^31): the old BIGINT formulation wrapped
    // 2^32·3e9 to a negative threshold — silent zero-keep data loss at
    // exactly the web scale the op targets. The DECIMAL path computes
    // the exact quotient; the cap branch still short-circuits.
    val cases = Seq(
      // (n_target, n_docs, expected min(2^32, 2^32·t/d))
      (3000000000L, 6000000000L, 2147483648L),         // overflow regime, t < d
      (3000000000L, 2000000000L, 4294967296L),          // cap branch, t ≥ d
      (7L, 9L, 7L * 4294967296L / 9L),                  // small exact floor
      (0L, 5L, 0L),                                     // zero target
      (9000000000000000000L, 9100000000000000000L,      // near-Long targets
        (BigInt(9000000000000000000L) * BigInt(4294967296L)
          / BigInt(9100000000000000000L)).toLong))
    val got = cases.map { case (t, d, _) => (t, d) }
      .toDF("n_target", "n_docs")
      .withColumn("threshold", LlmData.mixThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (t, d, want) =>
      assert(got((t, d)) == want, s"threshold($t, $d)")
      assert(got((t, d)) >= 0L, s"threshold($t, $d) wrapped negative")
    }
  }

  test("corpus_mix gives an unmapped language zero target, NULL fill (K43)") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, s"tok$i", if (i <= 16) "en" else "xx"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_k43_").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val byLang = LlmData.corpusMix(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val xx = byLang("xx")
    assert(xx.getLong(2) == 0L && xx.getLong(3) == 0L && xx.isNullAt(4))
    // mapped language still targets (400‰ of budget 10) = 4
    assert(byLang("en").getLong(2) == 4L)
  }
  test("temperature sampling flattens the mixture within budget (K55)") {
    val rows = LlmData.sampleTemperature(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var budgetUsed = 0L
    var totalDocs = 0L
    for (r <- rows) {
      val (n, w, target, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      // weight is exactly round(sqrt(n)*1e6)
      assert(w == math.round(math.sqrt(n.toDouble) * 1e6))
      assert(kept <= n, "never upsamples")
      budgetUsed += target
      totalDocs += n
    }
    // floored targets never exceed the half-corpus budget
    assert(budgetUsed <= totalDocs / 2)
    // flattening law: for any two languages with n_a <= n_b the target
    // ratio compresses toward 1 relative to proportional sampling —
    // target_a/target_b >= n_a/n_b, cross-multiplied to stay integer
    for (a <- rows; b <- rows
         if a.getLong(1) <= b.getLong(1) && b.getLong(3) > 0)
      assert(a.getLong(3) * b.getLong(1) + b.getLong(1) // + slack for the
        >= b.getLong(3) * a.getLong(1), // floor on both targets
        s"${a.getString(0)} vs ${b.getString(0)}: sqrt flattening violated")
  }

  test("corpus drift ranks by the exact TV numerator; sides partition the corpus (K56)") {
    val rows = LlmData.corpusDrift(spark, sfDir).collect()
    assert(rows.length == 20)
    val nums = rows.map(_.getLong(3)).toSeq
    assert(nums == nums.sorted.reverse, "must be sorted by drift desc")
    // recompute the top row's numerator from raw counts driver-side
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
    val sideOf = docs.map(r => r.getLong(0) ->
      (r.getString(1).drop(3).toLong % 2 == 0)).toMap
    val counts = scala.collection.mutable.Map
      .empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    for (r <- docs; tok <- r.getString(2).split(" ", -1)) {
      val (a, b) = counts(tok)
      counts(tok) = if (sideOf(r.getLong(0))) (a + 1, b) else (a, b + 1)
    }
    val nA = counts.valuesIterator.map(_._1).sum
    val nB = counts.valuesIterator.map(_._2).sum
    for (r <- rows.take(3)) {
      val (cA, cB) = counts(r.getString(0))
      assert(r.getLong(1) == cA && r.getLong(2) == cB)
      assert(r.getLong(3) == math.abs(cA * nB - cB * nA),
        s"token ${r.getString(0)}: numerator mismatch")
    }
  }

  test("bloom-prefiltered decontamination is row-identical to the exact form (K58)") {
    // the exactness-preservation theorem: no false negatives + the
    // unchanged exact join downstream => identical output; a hashing
    // mismatch between builder (putString) and probe (UTF-8 binary)
    // would surface here as dropped removals
    val exact = LlmData.decontaminate(spark, sfDir).collect().toSeq
    val bloom = LlmData.decontaminateBloom(spark, sfDir).collect().toSeq
    assert(exact == bloom)
    assert(exact.exists(_.getLong(2) > 0), "fixture must exercise removals")
    // and the probe itself: members always hit, a non-member miss
    // exists at 1% fpp over a tiny probe set
    import spark.implicits._
    val bench = Seq("alpha", "beta", "gamma").toDF("s")
    val bf = bench.stat.bloomFilter("s", 3, 0.01)
    val probes = (Seq("alpha", "beta", "gamma") ++
      (1 to 100).map(i => s"other$i")).toDF("s")
      .select($"s", graft.functions.BloomMightContain($"s", bf).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(Seq("alpha", "beta", "gamma").forall(probes), "no false negatives ever")
    assert((1 to 100).count(i => probes(s"other$i")) <= 5,
      "fpp far above the 1% design point")
  }

  test("charset screen counts the injected non-ASCII and control chars (K49)") {
    val rows = LlmData.textCharset(spark, sfDir).collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val id = r.getLong(0)
      // the accents land exactly on the %5 docs, the BEL on the %13 docs
      assert((r.getLong(2) > 0) == (id % 5 == 0))
      assert(r.getLong(3) == (if (id % 13 == 0) 1L else 0L))
      assert((r.getDouble(4) < 1.0) == (id % 5 == 0))
    }
  }

  test("incremental dedup emits one decision per new doc; counts are consistent (K52)") {
    val rows = LlmData.dedupIncremental(spark, sfDir).collect()
    // exactly the new batch, each exactly once
    assert(rows.map(_.getLong(0)).toSeq ==
      rows.map(_.getLong(0)).distinct.sorted.toSeq)
    assert(rows.forall(_.getLong(0) % 10 == 0))
    for (r <- rows) {
      val (nCand, nDups, novel) = (r.getLong(1), r.getLong(2), r.getBoolean(5))
      assert(nDups <= nCand)
      assert(novel == (nDups == 0))
      // a duplicate verdict always carries its best partner and score
      if (nDups > 0) {
        assert(!r.isNullAt(3) && r.getDouble(3) >= 0.5)
        assert(!r.isNullAt(4) && r.getLong(4) % 10 != 0)
      } else assert(r.isNullAt(3) && r.isNullAt(4))
    }
    // non-vacuous on the fixture: both verdicts occur
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)))
  }

  test("pack_sequences conserves chunks and satisfies the next-fit laws (K53)") {
    import org.apache.spark.sql.functions._
    val seqLen = 64
    val packed = LlmData.packSequences(spark, sfDir).collect()
    // conservation: every K30 chunk lands in exactly one sequence
    val chunkRows = LlmData.chunkTokens(spark, sfDir)
      .agg(count(lit(1)), sum(col("n_chunk_toks"))).head()
    assert(packed.map(_.getLong(2)).sum == chunkRows.getLong(0))
    assert(packed.map(_.getLong(4)).sum == chunkRows.getLong(1))
    // members are exhaustive and disjoint across sequences
    val members = packed.flatMap(_.getString(6).split(","))
    assert(members.length.toLong == chunkRows.getLong(0))
    assert(members.distinct.length == members.length)
    for (r <- packed) {
      val (nChunks, nDocs, nToks, fill) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      // capacity: a sequence never overflows; fill_ratio is exact n/L
      assert(nToks <= seqLen && nChunks >= 1 && nDocs >= 1 && nDocs <= nChunks)
      assert(math.abs(fill - nToks.toDouble / seqLen) < 1e-9)
    }
    // next-fit tightness law: consecutive sequences of one shard can
    // never both be mergeable — seq i closed BECAUSE seq i+1's first
    // chunk (≤ 32 tokens) did not fit, so fill_i + 32 > L or
    // fill_i + first(i+1) > L; weaker corollary pinned here: within a
    // shard, at most the LAST sequence may be under half capacity
    for ((_, seqs) <- packed.groupBy(_.getLong(0))) {
      val byId = seqs.sortBy(_.getLong(1))
      assert(byId.map(_.getLong(1)).toSeq == byId.indices.map(_.toLong))
      byId.dropRight(1).foreach(r => assert(r.getLong(4) > seqLen - 32,
        s"non-final sequence ${r.getLong(1)} of shard ${r.getLong(0)} " +
          s"closed at fill ${r.getLong(4)} though any <=32-token chunk fit"))
    }
  }

  test("K61: epoch planning caps repeats at 4 and flattens toward low-resource") {
    val rows = LlmData.corpusEpochs(spark, sfDir).collect()
    assert(rows.length >= 2)
    val totalAvail = rows.map(_.getLong(2)).sum
    // targets sum to the declared 2x budget (up to one floor per lang)
    val totalTarget = rows.map(_.getLong(3)).sum
    assert(totalTarget <= 2 * totalAvail &&
      totalTarget > 2 * totalAvail - rows.length)
    for (r <- rows) {
      val (avail, target, eff) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(eff == math.min(target, 4 * avail))
      assert(r.getDouble(5) <= 4.0 + 1e-9, "never more than 4 epochs")
      assert(math.abs(r.getDouble(5) - eff.toDouble / avail) < 1e-6)
      assert(r.getDouble(6) <= 1.0 + 1e-9)
    }
    // temperature flattening: repeat factors never increase with
    // availability (epochs = min(target/avail, 4), target/avail ~ 1/sqrt)
    val byAvail = rows.sortBy(_.getLong(2))
    byAvail.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(5) + 1e-6 >= hi.getDouble(5),
          s"${lo.getString(0)} vs ${hi.getString(0)}")
      case _ =>
    }
  }

  test("K62: quality-dup calibration conserves docs and dup membership") {
    val rows = LlmData.qualityDupCalibration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.ops.Util.t(spark, sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // dup membership total == docs whose text occurs more than once
    // coalesce: a fixture scale with NO exact dups sums over zero rows
    val nDupMembers = docs
      .groupBy(org.apache.spark.sql.functions.col("text"))
      .count().filter(org.apache.spark.sql.functions.col("count") > 1)
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("count")),
        org.apache.spark.sql.functions.lit(0L))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == nDupMembers)
    for (r <- rows) {
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 10)
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("K59: bpe_learn_merges agrees with an independent driver-side recount") {
    val got = LlmData.bpeLearnMerges(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.length == 20)
    // independent path: regex in plain Scala over the collected corpus
    val re = LlmData.BpeTokenPattern.r
    val counts = scala.collection.mutable.Map.empty[String, Long]
    graft.ops.Util.t(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect().foreach { row =>
      re.findAllIn(row.getString(0)).foreach { w =>
        if (w.length >= 2)
          w.sliding(2).foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
      }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == want,
      s"top-20 merge candidates diverge:\n got=${got.mkString(",")}\n want=${want.mkString(",")}")
    // descending with the declared tie-break
    got.sliding(2).foreach {
      case Array((p1, n1), (p2, n2)) =>
        assert(n1 > n2 || (n1 == n2 && p1 < p2))
      case _ =>
    }
  }

  test("K63: boilerplate = segments shared across DISTINCT docs only") {
    import spark.implicits._
    val shared = (0 until 8).map(i => s"s$i").mkString(" ") // one full segment
    val docs = Seq(
      (0L, shared + " tail0 t1"),              // segs: shared, "tail0 t1"
      (1L, shared + " other x y z"),           // segs: shared, "other x y z"
      (2L, "p q r s t u v w"),                 // unique single segment
      (3L, ("m " * 16).trim)                   // "m"×8 twice — SAME doc only
    ).toDF("doc_id", "text")
    val r = LlmData.boilerplateCounts(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r(0L) == ((2L, 1L, 0.5)))
    assert(r(1L) == ((2L, 1L, 0.5)))
    assert(r(2L) == ((1L, 0L, 0.0)))
    // within-one-doc repetition is NOT boilerplate (distinct-doc bar)
    assert(r(3L) == ((2L, 0L, 0.0)))
  }

  test("K65: split-leakage categories partition the verified pair set") {
    val rows = LlmData.splitLeakage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    for ((lo, hi, n, leak) <- rows) {
      assert(lo <= hi, "category pair must be canonical")
      assert(leak == (lo != hi), "leak flag must match the category pair")
      assert(n >= 1)
    }
    // the categories partition the K6 pair relation exactly
    val total = LlmData.ensurePairs(spark, sfDir).count()
    assert(rows.map(_._3).sum == total,
      "every verified pair lands in exactly one category")
  }

  test("K63: randomized differential vs a plain-Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(63)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "nav", "menu")
    val shared = Seq.fill(LlmData.BoilerSegTokens)(vocab(rnd.nextInt(4)))
      .mkString(" ")
    val docs = (0L until 20L).map { i =>
      val body = Seq.fill(3 + rnd.nextInt(18))(vocab(rnd.nextInt(vocab.size)))
      // every 3rd doc carries the shared "nav bar" segment up front
      i -> (if (i % 3 == 0) shared + " " + body.mkString(" ")
            else body.mkString(" "))
    }
    val ref = {
      val segs = docs.map { case (id, text) =>
        id -> text.split(" ").grouped(LlmData.BoilerSegTokens)
          .map(_.mkString(" ")).toSeq
      }
      val freq = segs.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
      segs.map { case (id, ss) =>
        id -> ((ss.length.toLong,
          ss.count(s => freq(s) >= LlmData.BoilerMinDocs).toLong))
      }.toMap
    }
    val got = LlmData.boilerplateCounts(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == ref, s"boilerplate accounting diverges:\n got=$got\n ref=$ref")
    // and the plant is detected: shared segments span ≥ 7 docs
    assert(got.filter(_._1 % 3 == 0).forall(_._2._2 >= 1))
  }

  test("K63: fixture boilerplate accounting is internally consistent") {
    val rows = LlmData.textBoilerplate(spark, sfDir).collect()
    val nDocs = graft.ops.Util.t(spark, sfDir, "documents").count()
    assert(rows.length == nDocs, "every document gets a row")
    for (r <- rows) {
      val (nSeg, nBoiler, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nSeg >= 1 && nBoiler >= 0 && nBoiler <= nSeg)
      assert(math.abs(ratio - nBoiler.toDouble / nSeg) < 1e-6)
    }
    // the fixture plants exact duplicates → some boilerplate must exist
    assert(rows.map(_.getLong(2)).sum > 0)
  }

  test("K68 embedding contamination screen: a planted same-cell " +
      "paraphrase is flagged; a cross-cell one is honestly missed") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextGaussian().toFloat)
    val b0 = vec()
    val bench = Seq((0, 1L, b0), (1, 2L, vec()))
      .toDF("cell", "vec_id", "embedding")
    // corpus: noise in both cells, a scaled copy of bench #1 in ITS
    // cell (must flag), and another scaled copy placed in the WRONG
    // cell (must be missed — the screen is cell-scoped by design)
    val corpus = (Seq((0, 10L, vec()), (1, 11L, vec()),
      (0, 12L, b0.map(_ * 1.0005f)), (1, 13L, b0.map(_ * 1.001f))))
      .toDF("cell", "vec_id", "embedding")
    val r = graft.ops.LlmData
      .embeddingContaminationScreen(bench, corpus, tau = 0.9).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 4L, "2 bench x 2 corpus per cell = 4 pairs")
    assert(r.getLong(3) == 1L,
      s"exactly the same-cell planted copy is flagged, got $r")
    assert(r.getDouble(4) == 1.0)
    // clean isotropic corpus: nothing flags
    val clean = graft.ops.LlmData.embeddingContaminationScreen(bench,
      corpus.filter($"vec_id" < 12L), tau = 0.9).collect()(0)
    assert(clean.getLong(3) == 0L)
  }

  test("K68 registered query executes and reports a consistent summary") {
    val r = graft.ops.LlmData.contaminationEmbedding(spark, sfDir)
      .collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getLong(2) > 0, "cell-mates must be screened")
    assert(r.getLong(3) >= 0 && r.getLong(3) <= r.getLong(2))
  }

  test("K73 soft-dedup weights partition each text's unit mass: " +
    "total effective docs == distinct texts, and eff <= raw per source") {
    val rows = graft.ops.LlmData.dedupSoft(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var eff = 0.0; var raw = 0L
    for (r <- rows) {
      val (n, dup, e) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(e > 0.0 && e <= n + 1e-6, s"eff $e out of (0, $n]")
      assert(dup >= 0 && dup <= n)
      eff += e; raw += n
    }
    val distinctTexts = graft.ops.Util.t(spark, sfDir, "documents")
      .select("text").distinct().count()
    // each text's copies carry 1/n each — the weights sum to exactly 1
    // per distinct text, across whatever sources the copies landed in
    assert(math.abs(eff - distinctTexts) < 1e-3,
      s"eff mass $eff != distinct texts $distinctTexts")
    assert(raw == graft.ops.Util.t(spark, sfDir, "documents").count())
  }

  test("K74 fertility is >= 1 (every whitespace word yields at least " +
    "one BPE pre-token) and totals match the K17 per-doc surface") {
    val rows = graft.ops.LlmData.textFertility(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getDouble(4) >= 1.0, s"lang ${r.getString(0)} fertility < 1")
    val (ws, bpe) = rows.foldLeft((0L, 0L)) { case ((a, b), r) =>
      (a + r.getLong(2), b + r.getLong(3)) }
    import org.apache.spark.sql.functions.sum
    val perDoc = graft.ops.LlmData.textTokensBpe(spark, sfDir)
      .agg(sum("n_ws"), sum("n_bpe")).collect()(0)
    assert(ws == perDoc.getLong(0) && bpe == perDoc.getLong(1))
  }

  test("chunk_sliding closed forms match a brute-force window walk (K75)") {
    import org.apache.spark.sql.functions.{col, size, split}
    // the splitter semantics, literally: emit [start, start+S) clipped,
    // advance by T while the previous window did not reach the end
    def walk(len: Long): (Long, Long) = {
      var start = 0L; var chunks = 0L; var emitted = 0L
      var done = false
      while (!done) {
        val end = math.min(start + LlmData.SlideSize, len)
        chunks += 1; emitted += end - start
        if (end >= len) done = true else start += LlmData.SlideStride
      }
      (chunks, emitted)
    }
    val lens = graft.ops.Util.t(spark, sfDir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = lens.groupBy(_._1).map { case (src, rs) =>
      val walks = rs.map(r => walk(r._2))
      (src, (rs.length.toLong, rs.map(_._2).sum,
        walks.map(_._1).sum, walks.map(_._2).sum))
    }
    val out = LlmData.chunkSliding(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nd, nt, nc, ne) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == nd)
      assert(r.getAs[Long]("n_tokens") == nt)
      assert(r.getAs[Long]("n_chunks") == nc, s"chunks for ${r}")
      assert(r.getAs[Long]("n_emitted") == ne, s"emitted for ${r}")
    }
    // the edge lengths the fixture may not contain
    Seq(1L, 95L, 96L, 127L, 128L, 129L, 224L, 225L, 1000L).foreach { l =>
      val (c, e) = walk(l)
      val nc = if (l <= 128) 1L else (l - 128 + 95) / 96 + 1
      assert(c == nc, s"len=$l chunks")
      assert(e == l + 32 * (nc - 1), s"len=$l emitted")
    }
  }

  test("pack_efficiency conserves slots at every context length (K76)") {
    val out = LlmData.packEfficiency(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("ctx")).toSeq ==
      LlmData.PackContexts.map(_.toLong))
    out.foreach { r =>
      val ctx = r.getAs[Long]("ctx")
      val slots = r.getAs[Long]("n_tokens") + r.getAs[Long]("n_padding")
      assert(r.getAs[Long]("n_padding") >= 0L)
      assert(slots == r.getAs[Long]("n_seqs") * ctx)
      assert(r.getAs[Long]("n_seqs") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("efficiency") <= 1.0)
    }
    // padding can only grow with the context length under
    // doc-per-sequence batching of a FIXED corpus
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_padding") <= b.getAs[Long]("n_padding"))
      case _ =>
    }
  }

  // ---- K90 code-vs-prose detection ----

  test("K90: injected code docs flag, markup-only docs stay below threshold") {
    val rows = ops.LlmData.textCodeDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val codeChars = r.getLong(2)
      val isCode = r.getBoolean(4)
      if (id % 7 == 0)
        assert(isCode, s"doc $id carries the injected code fragment")
      else if (id % 11 == 0)
        assert(!isCode && codeChars > 0 && codeChars < 10,
          s"doc $id: light markup must stay below the threshold")
      else
        assert(codeChars == 0L,
          s"doc $id: the fixture prose has no code punctuation")
    }
  }

}
