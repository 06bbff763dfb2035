package graft.sources

import java.util.UUID

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 WRITE path — the sink-side counterpart of the [[CensusSource]]
  * read rung (SURVEY §7.3's capability ladder): a `TableProvider` with
  * `SupportsWrite` implementing the full batch commit protocol
  * (`WriteBuilder` → `BatchWrite` → per-task `DataWriter` → driver
  * `commit`/`abort`).
  *
  * Semantics: the staged-publish discipline of the reference's
  * warehouse COPY step (`Test_census_tract.py:246-282` — stage to S3,
  * then one transactional COPY): every task writes its rows to a
  * TASK-PRIVATE temp file and reports it in its commit message; ONLY
  * the driver's `commit` publishes, by moving the temp files into
  * place and writing a `_graft_manifest.json` listing exactly the
  * committed files. Readers that trust the manifest never observe a
  * torn write: a failed/speculated task's file is never listed, and
  * `abort` removes the staging directory wholesale. This is the
  * manifest-commit pattern of production lake formats, scaled down to
  * an audit sink: the commit cost is one driver-side manifest write +
  * one rename per task file, never a directory listing race.
  *
  * Format: header-less CSV of primitive columns (long/int/double/
  * string/boolean; strings always quoted with `""` escaping) — an
  * audit sink's schema, enforced at write-build time. `mode`:
  * append adds files to the manifest; overwrite (`SupportsTruncate`)
  * replaces manifest and files.
  */
class AuditSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  // write-only: reads go through the manifest (AuditSink.committedFiles)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "graft audit sink is write-only; read the manifest-listed files")
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new AuditTable(schema, Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("audit sink requires a path option")))
}

object AuditSink {
  val ManifestFile = "_graft_manifest.json"

  /** Parse one quoted-string array field out of the manifest:
    * `"key":["a","b"]` → Seq(a, b). */
  private[sources] def manifestField(body: String, key: String): Seq[String] = {
    val start = body.indexOf(s""""$key":[""")
    if (start < 0) return Seq.empty
    val open = body.indexOf('[', start)
    val close = body.indexOf(']', open)
    "\"([^\"]+)\"".r.findAllMatchIn(body.substring(open, close + 1))
      .map(_.group(1)).toSeq
  }

  private[sources] def readManifest(fs: FileSystem, dir: Path): String = {
    val mf = new Path(dir, ManifestFile)
    if (!fs.exists(mf)) return ""
    val in = fs.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The files a committed write published — what a reader trusts. */
  def committedFiles(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    manifestField(readManifest(fs, p), "files").map(n => s"$dir/$n")
  }

  /** The epoch ids a streaming write already committed — what makes a
    * replayed epoch a no-op. */
  def committedEpochs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    manifestField(readManifest(fs, p), "epochs").map(_.toLong)
  }
}

private class AuditTable(tableSchema: StructType, path: String)
  extends Table with SupportsWrite {
  override def name(): String = s"graft-audit($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AuditWriteBuilder(info.schema(), path, truncate = false)
}

private class AuditWriteBuilder(schema: StructType, path: String,
    truncate: Boolean) extends WriteBuilder with SupportsTruncate {
  schema.fields.foreach { f =>
    require(AuditWrite.supported(f.dataType),
      s"audit sink supports primitive columns only, got ${f.name}: ${f.dataType}")
  }
  override def truncate(): WriteBuilder =
    new AuditWriteBuilder(schema, path, truncate = true)
  override def build(): Write = new AuditWrite(schema, path, truncate)
}

private object AuditWrite {
  def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DoubleType | StringType | BooleanType => true
    case _ => false
  }
}

private class AuditWrite(schema: StructType, path: String, truncate: Boolean)
  extends Write {
  // captured on the driver at plan time: the SESSION Hadoop conf
  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
  override def toBatch: BatchWrite =
    new AuditBatchWrite(schema, path, truncate, conf)
  override def toStreaming: StreamingWrite =
    new AuditStreamingWrite(schema, path, conf)
}

/** Shared manifest writer: `files` is what readers scan, `epochs` is
  * the streaming replay ledger. Written atomically LAST, after every
  * referenced file exists — staged to a temp name and renamed over the
  * old manifest (`Options.Rename.OVERWRITE`), so a crash mid-publish
  * leaves the OLD manifest or the NEW one, never a torn/empty file,
  * and a concurrent reader always sees a complete manifest. */
private object AuditManifest {
  def write(fs: FileSystem, dir: Path, writeId: String,
      epochs: Seq[String], files: Seq[String]): Unit = {
    def arr(xs: Seq[String]) = xs.map(x => s""""$x"""").mkString("[", ",", "]")
    val body = s"""{"write_id":"$writeId","epochs":${arr(epochs)},""" +
      s""""files":${arr(files)}}"""
    val tmp = new Path(dir, AuditSink.ManifestFile + s".tmp-$writeId")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(dir).toUri, fs.getConf)
    fc.rename(fs.makeQualified(tmp),
      fs.makeQualified(new Path(dir, AuditSink.ManifestFile)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}

/** Hadoop `Configuration` is not `java.io.Serializable` (it is a
  * `Writable`). This wrapper ships the SESSION Hadoop conf to task
  * writers and driver commit paths so filesystem settings configured
  * on the session (object-store credentials, endpoints) are honored on
  * any non-default FS instead of being silently dropped by a bare
  * `new Configuration()`. */
private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private case class AuditTaskCommit(tempFile: String, finalName: String,
    rows: Long) extends WriterCommitMessage

private class AuditBatchWrite(schema: StructType, path: String,
    truncate: Boolean, conf: SerializableHadoopConf) extends BatchWrite {
  private val writeId = UUID.randomUUID().toString

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    // the factory ships only (path, writeId, type tags, session conf) —
    // executors rebuild FS/encoder state locally from those
    new AuditWriterFactory(path, writeId,
      schema.fields.map(_.dataType.typeName), conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    val commits = messages.collect { case m: AuditTaskCommit => m }
    // previously-manifested files: append keeps them, truncate retires
    // them (after the new manifest is live)
    val body = AuditSink.readManifest(fs, dir)
    val previous = AuditSink.manifestField(body, "files")
    val prevEpochs =
      if (truncate) Seq.empty else AuditSink.manifestField(body, "epochs")
    val outgoing =
      if (truncate) previous.filterNot(commits.map(_.finalName).contains)
      else Seq.empty
    // publish: move task files into place, THEN write the manifest —
    // a crash between the two leaves unmanifested (invisible) files,
    // never a manifest pointing at nothing; retired files are deleted
    // only after the new manifest is live
    commits.foreach { c =>
      fs.rename(new Path(c.tempFile), new Path(dir, c.finalName)); ()
    }
    val names = (if (truncate) Seq.empty else previous) ++
      commits.map(_.finalName)
    AuditManifest.write(fs, dir, writeId, prevEpochs, names)
    outgoing.foreach(n => fs.delete(new Path(dir, n), false))
    fs.delete(new Path(dir, s"_staging_$writeId"), true); ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.delete(new Path(dir, s"_staging_$writeId"), true); ()
  }
}

/** Streaming flavor: per-epoch staged files, and a commit that is a
  * NO-OP for an already-committed epoch — Structured Streaming replays
  * the last epoch after recovery, and the manifest's epoch ledger is
  * what turns at-least-once re-delivery into exactly-once publication
  * (the sink-native form of the J9 idempotent-foreachBatch pattern). */
private class AuditStreamingWrite(schema: StructType, path: String,
    conf: SerializableHadoopConf) extends StreamingWrite {
  private val writeId = UUID.randomUUID().toString

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new AuditStreamingWriterFactory(path, writeId,
      schema.fields.map(_.dataType.typeName), conf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    val commits = messages.collect { case m: AuditTaskCommit => m }
    val body = AuditSink.readManifest(fs, dir)
    val files = AuditSink.manifestField(body, "files")
    val epochs = AuditSink.manifestField(body, "epochs")
    if (epochs.contains(epochId.toString)) {
      // replayed epoch: already published — drop the re-staged files,
      // change nothing
      commits.foreach(c => fs.delete(new Path(c.tempFile), false))
    } else {
      commits.foreach { c =>
        fs.rename(new Path(c.tempFile), new Path(dir, c.finalName)); ()
      }
      AuditManifest.write(fs, dir, writeId,
        epochs :+ epochId.toString, files ++ commits.map(_.finalName))
    }
    fs.delete(new Path(new Path(dir, s"_staging_$writeId"), s"e$epochId"), true)
    ()
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.delete(new Path(new Path(dir, s"_staging_$writeId"), s"e$epochId"), true)
    ()
  }
}

private class AuditWriterFactory(path: String, writeId: String,
    typeNames: Array[String], conf: SerializableHadoopConf)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    // the per-write UUID is part of the FINAL name: (partitionId,
    // taskId) is only unique within one SparkContext, so a second
    // application appending to the same sink dir could otherwise
    // silently clobber a previously committed file and double-list its
    // name in the manifest
    val name = f"part-$writeId-$partitionId%05d-$taskId.csv"
    new AuditDataWriter(
      new Path(new Path(path, s"_staging_$writeId"), name), name,
      typeNames, conf)
  }
}

private class AuditStreamingWriterFactory(path: String, writeId: String,
    typeNames: Array[String], conf: SerializableHadoopConf)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val name = f"part-$writeId-e$epochId-$partitionId%05d-$taskId.csv"
    new AuditDataWriter(
      new Path(new Path(new Path(path, s"_staging_$writeId"), s"e$epochId"),
        name),
      name, typeNames, conf)
  }
}

/** Task-side writer: rows stream to a task-private staging file; the
  * task NEVER touches the final name (speculation-safe — two attempts
  * stage two files, the driver commits exactly one). */
private class AuditDataWriter(tempPath: Path, fileName: String,
    typeNames: Array[String], conf: SerializableHadoopConf)
  extends DataWriter[InternalRow] {

  private val fs = tempPath.getFileSystem(conf.value)
  // buffer the row-sized writes: the FS stream pays checksum + syscall
  // bookkeeping per write() call, and rows are tens of bytes
  private val out = new java.io.BufferedOutputStream(
    fs.create(tempPath, true), 1 << 16)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val sb = new StringBuilder
    var i = 0
    while (i < typeNames.length) {
      if (i > 0) sb.append(',')
      if (!row.isNullAt(i)) typeNames(i) match {
        case "long" => sb.append(row.getLong(i))
        case "integer" => sb.append(row.getInt(i))
        case "double" => sb.append(row.getDouble(i))
        case "boolean" => sb.append(row.getBoolean(i))
        case "string" =>
          sb.append('"')
            .append(row.getUTF8String(i).toString.replace("\"", "\"\""))
            .append('"')
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      i += 1
    }
    sb.append('\n')
    out.write(sb.toString.getBytes("UTF-8"))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    AuditTaskCommit(tempPath.toString, fileName, rows)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(tempPath, false); ()
  }

  override def close(): Unit = ()
}
