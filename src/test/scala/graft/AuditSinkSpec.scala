package graft

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.sources.AuditSink

/** The DSv2 WRITE rung: task-staged files published atomically by the
  * driver's manifest commit. Readers trust only manifest-listed files. */
class AuditSinkSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_audit_").toString + "/sink"

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("x", DoubleType)))

  private def readBack(dir: String) = {
    val files = AuditSink.committedFiles(spark, dir)
    spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\"")
      .csv(files: _*)
  }

  private def df(rows: Seq[(Long, String, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "s", "x")
  }

  test("overwrite publishes a manifest whose files round-trip the data") {
    val dir = tmp()
    val in = Seq((1L, "plain", 1.5), (2L, "quo\"ted, with comma", -0.25),
      (3L, null.asInstanceOf[String], 1e300))
    df(in).repartition(3).write.format("graft.sources.AuditSink")
      .mode("overwrite").option("path", dir).save()
    val got = readBack(dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        r.getDouble(2))).toSet
    assert(got == in.toSet)
    // staging directory is gone after commit
    assert(!new java.io.File(dir).listFiles.exists(_.getName.startsWith("_staging_")))
  }

  test("append accumulates manifested files; overwrite retires them") {
    val dir = tmp()
    df(Seq((1L, "a", 1.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("overwrite").option("path", dir).save()
    df(Seq((2L, "b", 2.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("append").option("path", dir).save()
    assert(readBack(dir).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(AuditSink.committedFiles(spark, dir).size == 2)
    // a new overwrite replaces the manifest AND deletes retired files
    df(Seq((9L, "z", 9.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("overwrite").option("path", dir).save()
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(9L))
    val leftover = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".csv"))
    assert(leftover.length == 1, leftover.mkString(","))
  }

  test("final file names embed the write id; no manifest temp lingers") {
    val dir = tmp()
    df(Seq((1L, "a", 1.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("overwrite").option("path", dir).save()
    df(Seq((2L, "b", 2.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("append").option("path", dir).save()
    val names = AuditSink.committedFiles(spark, dir).map(_.split('/').last)
    // (partitionId, taskId) is only unique within one SparkContext; the
    // per-write UUID in the FINAL name is what stops a second
    // application's append from clobbering a committed file
    val fmt = ("part-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-" +
      "[0-9a-f]{12}-\\d{5}-\\d+\\.csv").r
    names.foreach(n => assert(fmt.pattern.matcher(n).matches, n))
    assert(names.map(_.substring(5, 41)).distinct.size == 2,
      s"two writes must carry two distinct write ids: $names")
    // the staged manifest publish leaves no temp file behind
    assert(!new java.io.File(dir).listFiles.exists(_.getName.contains(".tmp-")))
  }

  test("unmanifested files are invisible to readers") {
    val dir = tmp()
    df(Seq((1L, "a", 1.0))).coalesce(1)
      .write.format("graft.sources.AuditSink")
      .mode("overwrite").option("path", dir).save()
    // simulate an orphaned file from a crashed/speculated task: it sits
    // in the directory but not in the manifest
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-99999-0.csv"), "99,\"ghost\",0.0\n")
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(1L),
      "reader must trust only the manifest")
  }

  test("non-primitive columns are rejected at write-build time") {
    import spark.implicits._
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    val e = intercept[Exception] {
      bad.write.format("graft.sources.AuditSink")
        .mode("overwrite").option("path", tmp()).save()
    }
    assert(e.getMessage.contains("primitive columns only"), e.getMessage)
  }

  test("streaming write publishes per-epoch and survives restart exactly-once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmp()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_audit_ck_").toString
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Double)]
    def start() = in.toDF().toDF("id", "s", "x").writeStream
      .format("graft.sources.AuditSink")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q1 = start()
    try {
      in.addData((1L, "a", 1.0)); q1.processAllAvailable()
      in.addData((2L, "b", 2.0)); q1.processAllAvailable()
    } finally q1.stop()
    assert(readBack(dir).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    in.addData((3L, "c", 3.0)) // delivered while the query is down
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()
    val ids = readBack(dir).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L), s"exactly-once across restart, got $ids")
    assert(AuditSink.committedEpochs(spark, dir).nonEmpty)
  }

  test("a replayed epoch commit is a published no-op (exactly-once ledger)") {
    import scala.collection.JavaConverters._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.unsafe.types.UTF8String
    val dir = tmp()
    // drive the raw DSv2 streaming commit protocol, the way the engine
    // does after a recovery: stage + commit epoch 7, then REPLAY epoch
    // 7 with freshly staged files — the manifest's epoch ledger must
    // publish the first and no-op the second
    val provider = new graft.sources.AuditSink
    val table = provider.getTable(schema, Array.empty,
      Map("path" -> dir).asJava)
    val lwInfo = new LogicalWriteInfo {
      override def queryId(): String = "q-test"
      override def schema() = AuditSinkSpec.this.schema
      override def options() = new CaseInsensitiveStringMap(
        Map("path" -> dir).asJava)
    }
    val sw = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsWrite]
      .newWriteBuilder(lwInfo).build().toStreaming
    val pwInfo = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    def stageEpoch(epochId: Long, id: Long): org.apache.spark.sql.connector.write.WriterCommitMessage = {
      val w = sw.createStreamingWriterFactory(pwInfo).createWriter(0, 0L, epochId)
      w.write(new GenericInternalRow(
        Array[Any](id, UTF8String.fromString(s"row$id"), id.toDouble)))
      w.commit()
    }
    sw.commit(7L, Array(stageEpoch(7L, 1L)))
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the replay: same epoch id, new staged file, different row
    sw.commit(7L, Array(stageEpoch(7L, 99L)))
    assert(readBack(dir).collect().map(_.getLong(0)).toSeq == Seq(1L),
      "replayed epoch must not publish")
    assert(AuditSink.committedEpochs(spark, dir) == Seq(7L))
    // and a NEW epoch still publishes
    sw.commit(8L, Array(stageEpoch(8L, 2L)))
    assert(readBack(dir).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(AuditSink.committedEpochs(spark, dir) == Seq(7L, 8L))
  }

  test("registered sink_dsv2_audit round-trips the orders slice") {
    val out = SparkEntry.queries("sink_dsv2_audit")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val orig = graft.ops.Util.t(spark, sfDir, "orders").count()
    assert(out.length == orig)
  }
}
