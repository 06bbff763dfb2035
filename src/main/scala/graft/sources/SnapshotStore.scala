package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-swap snapshot store — the lakehouse time-travel core
  * (the public Delta/Iceberg design in miniature): a table is a
  * sequence of numbered MANIFESTS, each listing the data directories
  * that make up one immutable snapshot. Readers resolve a manifest
  * and read exactly its listed directories; writers stage data first
  * and publish the manifest LAST with an atomic rename — so a reader
  * can never observe a half-written snapshot, a crashed writer
  * leaves only invisible orphan data, and "time travel" is nothing
  * more than resolving an older manifest.
  *
  * Two commit kinds cover the real warehouse movements:
  *  - [[commitOverwrite]]: the new snapshot is exactly the new data
  *    (the rebuild/compaction shape — old directories stay on disk
  *    for older versions until a retention sweep).
  *  - [[commitAppend]]: the new snapshot is the previous manifest's
  *    directory list PLUS the new data — an append never rewrites or
  *    even reads existing data files, which is what makes incremental
  *    loads O(batch) instead of O(table).
  *
  * Scale shape: manifests are METADATA (a few hundred bytes per
  * commit, one line per data directory); data moves only through
  * ordinary parquet writes of the batch being committed. Version
  * resolution lists one directory. All FS access goes through the
  * session's Hadoop `FileSystem`, so the root may be any
  * executor-visible FS. Concurrency: the manifest rename is the
  * commit point — if two writers race to the same version number the
  * rename loser's manifest stays unpublished and its data dir is an
  * invisible orphan (same discipline as [[graft.ops.FixtureCache]]).
  */
object SnapshotStore {
  private val ManifestDir = "_manifests"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestPath(root: String, v: Int) =
    new Path(s"$root/$ManifestDir/v$v.list")

  /** Published versions, ascending (empty for a fresh root). */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val f = fs(spark, root)
    val dir = new Path(s"$root/$ManifestDir")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".list") =>
        n.stripPrefix("v").stripSuffix(".list").toInt }
      .sorted
  }

  /** The directory list of a published version. */
  private def readManifest(spark: SparkSession, root: String,
      v: Int): Seq[String] = {
    val f = fs(spark, root)
    val in = f.open(manifestPath(root, v))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** Stage `df` as a new data directory, then publish manifest
    * version `prev.max + 1` whose content is `carry ++ the new dir`.
    * The manifest itself is written to a temp name and RENAMED into
    * place — the atomic commit point. Returns the published version. */
  private def commit(spark: SparkSession, root: String, df: DataFrame,
      carryFrom: Option[Int]): Int = {
    val f = fs(spark, root)
    val existing = versions(spark, root)
    val v = existing.lastOption.getOrElse(0) + 1
    val dataDir = s"$root/data/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(dataDir)
    val carried = carryFrom.map(readManifest(spark, root, _)).getOrElse(Nil)
    val lines = (carried :+ dataDir).mkString("\n")
    val mDir = new Path(s"$root/$ManifestDir")
    if (!f.exists(mDir)) { f.mkdirs(mDir); () }
    val tmp = new Path(mDir, s".v$v.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = f.create(tmp, false)
    try out.write(lines.getBytes("UTF-8")) finally out.close()
    // rename is the commit point: the loser of a same-version race
    // fails here and its staged data stays an invisible orphan
    if (!f.rename(tmp, manifestPath(root, v))) {
      f.delete(tmp, false)
      throw new IllegalStateException(
        s"snapshot commit race lost for $root v$v")
    }
    v
  }

  /** Publish a snapshot that REPLACES the table content. */
  def commitOverwrite(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, carryFrom = None)

  /** Publish a snapshot that APPENDS to the latest version: the new
    * manifest carries the previous directory list forward — no
    * existing data file is read or rewritten. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame): Int =
    commit(spark, root, df, carryFrom = versions(spark, root).lastOption)

  // ---- WAP (write-audit-publish) staging ----
  //
  // The production load discipline the numbered versions alone can't
  // express: a batch lands on a STAGING manifest first (readers of the
  // table are oblivious — versions() never lists it), quality gates
  // run against the staged view, and only a passing batch is PUBLISHED
  // by renaming the staged manifest to the next version — one atomic
  // metadata operation, zero data movement. A failing batch is
  // discarded without ever having been visible; an abandoned staging
  // is reclaimed by [[vacuum]] like any crashed-writer orphan. Single
  // current writer modeled (the publish renames onto max+1; concurrent
  // publishers race on the rename and exactly one wins, the commit()
  // discipline).

  /** Stage an APPEND batch: data + a `staged-<id>.list` manifest
    * carrying the current latest's directory list. Returns the
    * staging id. */
  def stageAppend(spark: SparkSession, root: String, df: DataFrame): String = {
    val f = fs(spark, root)
    val id = java.util.UUID.randomUUID().toString.take(8)
    val dataDir = s"$root/data/staged-$id"
    df.write.mode("error").parquet(dataDir)
    val carried = versions(spark, root).lastOption
      .map(readManifest(spark, root, _)).getOrElse(Nil)
    val mDir = new Path(s"$root/$ManifestDir")
    if (!f.exists(mDir)) { f.mkdirs(mDir); () }
    val p = new Path(mDir, s"staged-$id.list")
    val out = f.create(p, false)
    try out.write((carried :+ dataDir).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    id
  }

  /** The staged VIEW (current content + the staged batch) — what the
    * audit queries read. Invisible to [[read]]/[[versions]]. */
  def readStaged(spark: SparkSession, root: String, id: String): DataFrame = {
    val f = fs(spark, root)
    val p = new Path(s"$root/$ManifestDir/staged-$id.list")
    require(f.exists(p), s"no staged manifest $id under $root")
    val in = f.open(p)
    val dirs = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList finally in.close()
    spark.read.parquet(dirs: _*)
  }

  /** PUBLISH a staged batch: rename the staged manifest to version
    * max+1 — the atomic commit point, no data moves. */
  def publishStaged(spark: SparkSession, root: String, id: String): Int = {
    val f = fs(spark, root)
    val src = new Path(s"$root/$ManifestDir/staged-$id.list")
    require(f.exists(src), s"no staged manifest $id under $root")
    val v = versions(spark, root).lastOption.getOrElse(0) + 1
    if (!f.rename(src, manifestPath(root, v)))
      throw new IllegalStateException(
        s"publish race lost for staged $id at $root v$v")
    v
  }

  /** Discard a failed staging: manifest first (it vanishes from any
    * future publish), then the staged data directory. */
  def discardStaged(spark: SparkSession, root: String, id: String): Unit = {
    val f = fs(spark, root)
    f.delete(new Path(s"$root/$ManifestDir/staged-$id.list"), false)
    f.delete(new Path(s"$root/data/staged-$id"), true)
    ()
  }

  /** Retention sweep — the VACUUM movement that makes the
    * overwrite-keeps-history design sustainable: keep the newest
    * `keepLast` published versions, delete the older manifests, then
    * delete every directory under `root/data` referenced by NO kept
    * manifest — which also reclaims crashed-writer orphans (staged
    * data whose manifest never published; invisible to readers, but
    * real bytes). Deletion order is manifests FIRST: a reader racing
    * the sweep can at worst fail to resolve a dropped version — it can
    * never resolve a manifest whose data is already gone (data
    * referenced by any surviving manifest is never touched; an
    * appended-forward directory survives as long as ANY keeper lists
    * it). Idempotent: a second sweep finds nothing to drop.
    *
    * Driver-side METADATA work only (list + delete, same division of
    * labor as every lakehouse VACUUM); returns
    * (droppedManifests, removedDataDirs). */
  def vacuum(spark: SparkSession, root: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, root)
    val vs = versions(spark, root)
    val keep = vs.takeRight(keepLast)
    val drop = vs.dropRight(keepLast)
    // resolve referenced dirs BEFORE dropping manifests
    val referenced = keep.flatMap(readManifest(spark, root, _))
      .map(new Path(_).getName).toSet
    drop.foreach(v => f.delete(manifestPath(root, v), false))
    val dataRoot = new Path(s"$root/data")
    val removed =
      if (!f.exists(dataRoot)) 0
      else {
        val orphans = f.listStatus(dataRoot).toSeq
          .filter(_.isDirectory).map(_.getPath)
          .filterNot(p => referenced.contains(p.getName))
        orphans.foreach(p => f.delete(p, true))
        orphans.length
      }
    (drop.length, removed)
  }

  /** Read a snapshot: the latest by default, or AS OF `asOf` (the
    * greatest published version ≤ asOf — the time-travel read). */
  def read(spark: SparkSession, root: String,
      asOf: Option[Int] = None): DataFrame = {
    val vs = versions(spark, root)
    require(vs.nonEmpty, s"no published snapshots under $root")
    val v = asOf.fold(vs.last) { bound =>
      vs.filter(_ <= bound).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot at or before v$bound under $root (have $vs)"))
    }
    spark.read.parquet(readManifest(spark, root, v): _*)
  }
}
