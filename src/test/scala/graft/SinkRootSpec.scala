package graft

/** Sink output-root override (round-4 verdict (c)): on a cluster the
  * driver-local temp default is invisible to executors, so A3/A4 must
  * honor a caller-supplied shared-FS root via `spark.graft.sinkRoot`. */
class SinkRootSpec extends SparkTestBase {

  test("caller-supplied sink root receives the sink output") {
    val root = java.nio.file.Files.createTempDirectory("graft_sinkroot_")
    spark.conf.set("spark.graft.sinkRoot", root.toString)
    try {
      assert(ops.Scans.sinkRoundtripCsv(spark, sfDir).count() > 0)
      assert(ops.Scans.sinkAppendAuditLog(spark, sfDir).count() > 0)
      val children = Option(root.toFile.listFiles).getOrElse(Array.empty)
        .map(_.getName)
      assert(children.exists(_.startsWith("csv_roundtrip_")), children.toSeq)
      assert(children.exists(_.startsWith("audit_log_")), children.toSeq)
    } finally {
      spark.conf.unset("spark.graft.sinkRoot")
    }
  }

  test("default (no override) still round-trips") {
    assert(ops.Scans.sinkRoundtripCsv(spark, sfDir).count() > 0)
  }

  test("compact: applying the plan reduces file count and preserves rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_").toString + "/t"
    // the J9/J15 pathology: many writer tasks per partition → many
    // small files (6 per partition here)
    val df = (1 to 600).map(i => (i.toLong, i % 3, s"payload_$i"))
      .toDF("id", "part", "payload")
    df.repartition(6, col("id")).write.partitionBy("part").parquet(root)
    def parquetFiles(): Int = {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .filter(_.isDirectory).map(d => fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")))
        .sum
    }
    val nBefore = parquetFiles()
    assert(nBefore >= 18, s"expected >=6 files x 3 partitions, got $nBefore")
    // huge target → every partition collapses to one group/file
    val (before, after) = ops.Layout.compact(spark, root, target = 1L << 30)
    assert(before == nBefore)
    assert(after == 3)
    assert(parquetFiles() == 3)
    // contents survive byte-for-byte (same rows, partition col intact)
    val got = spark.read.parquet(root)
      .select(col("id"), col("part").cast("int"), col("payload"))
      .as[(Long, Int, String)].collect().toSet
    assert(got == (1 to 600).map(i => (i.toLong, i % 3, s"payload_$i")).toSet)
    // idempotence: a second pass finds nothing to merge
    val (b2, a2) = ops.Layout.compact(spark, root, target = 1L << 30)
    assert(b2 == 3 && a2 == 3 && parquetFiles() == 3)
  }

  test("bandBySize: window banding bounds the compacted file count") {
    val sizes = Seq(60L, 60L, 60L, 30L, 120L, 10L)
    val bands = ops.Layout.bandBySize(sizes, 100L)
    // cum-before: 0,60,120,180,210,330 → windows 0,0,1,1,2,3 (the 120
    // file overflows window 2, so window 1's own budget under-fills —
    // bounded slack, documented in the scaladoc)
    assert(bands == Seq(0, 0, 1, 1, 2, 3))
    // the OPTIMIZE bound: at most total DIV target + 1 groups, ids
    // monotone over the file order
    assert(bands.distinct.length <= sizes.sum / 100L + 1)
    assert(bands == bands.sorted)
  }

  test("F12: delete plan bills whole touched files; totals match direct counts") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Layout.layoutDeletePlan(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (nFiles, touched) = (r.getLong(1), r.getLong(2))
      val (deleted, delB, rewB) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(touched <= nFiles)
      assert(rewB >= delB, "copy-on-write rewrites at least the deleted bytes")
      if (deleted > 0) {
        assert(touched > 0)
        // amplification = rewritten/deleted, and >= 1 by the law above
        assert(r.getDouble(6) >= 1.0)
        assert(math.abs(r.getDouble(6) - rewB.toDouble / delB) < 1e-4)
      } else assert(r.isNullAt(6) && touched == 0 && rewB == 0)
    }
    // grand totals agree with a direct pass over the erasure predicate
    val direct = graft.ops.Util.t(spark, sfDir, "events")
      .agg(sum(when(col("user_id") % 97 === 0, 1L).otherwise(0L)),
        count(lit(1))).head
    assert(rows.map(_.getLong(3)).sum == direct.getLong(0))
    // non-vacuous both ways: some rows die, most survive
    assert(direct.getLong(0) > 0 && direct.getLong(0) < direct.getLong(1))
  }
}
