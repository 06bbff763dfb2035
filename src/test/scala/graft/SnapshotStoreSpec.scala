package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotStore

/** Manifest-swap snapshot laws: append carries directories forward
  * without rewriting, time travel resolves historical content
  * exactly, orphan data without a manifest is invisible, and the
  * as-of resolution floor/error semantics hold. */
class SnapshotStoreSpec extends SparkTestBase {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_").toString + "/t"

  test("overwrite/append/overwrite: every version reads back exactly") {
    import spark.implicits._
    val root = freshRoot()
    val v1 = SnapshotStore.commitOverwrite(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val v2 = SnapshotStore.commitAppend(spark, root,
      Seq((3L, "c")).toDF("id", "v"))
    val v3 = SnapshotStore.commitOverwrite(spark, root,
      Seq((9L, "z")).toDF("id", "v"))
    assert(Seq(v1, v2, v3) == Seq(1, 2, 3))
    def ids(asOf: Int): Set[Long] =
      SnapshotStore.read(spark, root, Some(asOf))
        .collect().map(_.getLong(0)).toSet
    assert(ids(1) == Set(1L, 2L))
    assert(ids(2) == Set(1L, 2L, 3L))
    assert(ids(3) == Set(9L))
    // latest == v3
    assert(SnapshotStore.read(spark, root).collect().map(_.getLong(0)).toSet
      == Set(9L))
  }

  test("append publishes metadata only: v1's data files are untouched") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commitOverwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
        .flatMap(d => fs.listStatus(d.getPath))
        .filter(_.isFile)
        .map(f => f.getPath.toString -> f.getModificationTime).toMap
    val before = dataFiles()
    SnapshotStore.commitAppend(spark, root, Seq((2L, "b")).toDF("id", "v"))
    val after = dataFiles()
    // every v1 file survives with its original mtime; only new files added
    before.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"append touched existing file $p")
    }
    assert(after.size > before.size)
  }

  test("orphan data without a published manifest is invisible") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commitOverwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    // a crashed writer: staged data, no manifest
    Seq((99L, "ghost")).toDF("id", "v")
      .write.parquet(s"$root/data/v2-deadbeef")
    assert(SnapshotStore.versions(spark, root) == Seq(1))
    assert(SnapshotStore.read(spark, root).collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }

  test("as-of resolves to the floor version; below-first errors; empty root errors") {
    import spark.implicits._
    val root = freshRoot()
    intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, root)
    }
    SnapshotStore.commitOverwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotStore.commitOverwrite(spark, root, Seq((2L, "b")).toDF("id", "v"))
    // asOf beyond latest floors to latest
    assert(SnapshotStore.read(spark, root, Some(99)).collect()
      .map(_.getLong(0)).toSet == Set(2L))
    intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, root, Some(0)).collect()
    }
  }

  test("warehouse_time_travel query: v2 superset of v1, v3 the rebuild") {
    val rows = ops.Scans.warehouseTimeTravel(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val n = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(n(2) > n(1), "append must grow the table")
    assert(n(3) < n(2), "overwrite must replace, not accumulate")
  }

  test("vacuum keeps append-referenced dirs, reclaims orphans, idempotent") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commitOverwrite(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    SnapshotStore.commitAppend(spark, root, Seq((3L, "c")).toDF("id", "v"))
    SnapshotStore.commitOverwrite(spark, root, Seq((9L, "z")).toDF("id", "v"))
    // crashed writer: staged data, manifest never published
    Seq((99L, "x")).toDF("id", "v")
      .write.parquet(s"$root/data/orphan-crashed")
    val (dropped, removed) = SnapshotStore.vacuum(spark, root, keepLast = 2)
    assert(dropped == 1, "exactly the v1 manifest drops")
    assert(removed == 1, "exactly the orphan dir is reclaimed: v1's data " +
      "is still referenced by v2's append manifest")
    // dropped version no longer resolves...
    intercept[IllegalArgumentException] {
      SnapshotStore.read(spark, root, Some(1))
    }
    // ...but every keeper still serves its exact historical content
    assert(SnapshotStore.read(spark, root, Some(2))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    assert(SnapshotStore.read(spark, root, Some(3))
      .collect().map(_.getLong(0)).toSet == Set(9L))
    // a second sweep finds nothing
    assert(SnapshotStore.vacuum(spark, root, keepLast = 2) == ((0, 0)))
  }

  test("vacuum reclaims data of dropped overwrite versions") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commitOverwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    SnapshotStore.commitOverwrite(spark, root, Seq((2L, "b")).toDF("id", "v"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def nDataDirs: Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/data"))
        .count(_.isDirectory)
    assert(nDataDirs == 2)
    val (dropped, removed) = SnapshotStore.vacuum(spark, root, keepLast = 1)
    assert((dropped, removed) == ((1, 1)),
      "an overwrite-dropped version's data is unreferenced and reclaimed")
    assert(nDataDirs == 1)
    assert(SnapshotStore.read(spark, root).collect()
      .map(_.getLong(0)).toSet == Set(2L))
  }

  test("snapshot_vacuum query: constants and surviving content") {
    val rows = ops.Scans.snapshotVacuum(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 3))
    rows.foreach { r =>
      assert(r.getLong(3) == 1L, "one dropped manifest")
      assert(r.getLong(4) == 1L, "one reclaimed orphan dir")
    }
  }

  test("snapshot_optimize: layout shrinks, content identical, history intact (A25)") {
    val rows = ops.Scans.snapshotOptimize(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5))
    val byV = rows.map(r => r._1 -> r).toMap
    // OPTIMIZE never changes content: v5 ≡ v4 in rows and value mass
    assert(byV(5)._2 == byV(4)._2 && byV(5)._3 == byV(4)._3)
    // ...but shrinks the accreted small files 4 → 2
    assert(rows.map(_._4).toSeq == Seq(1L, 2L, 3L, 4L, 2L))
    // appends only ever grow the row count
    assert(byV(1)._2 < byV(2)._2 && byV(2)._2 < byV(3)._2 &&
      byV(3)._2 < byV(4)._2)
  }

  test("WAP: staged batches are invisible until published; discard erases (A29)") {
    import spark.implicits._
    val root = freshRoot()
    SnapshotStore.commitOverwrite(spark, root, Seq((1L, "a")).toDF("id", "v"))
    val id = SnapshotStore.stageAppend(spark, root,
      Seq((2L, "b")).toDF("id", "v"))
    // invisible: the table read and the version list are unchanged
    assert(SnapshotStore.versions(spark, root) == Seq(1))
    assert(SnapshotStore.read(spark, root).collect()
      .map(_.getLong(0)).toSet == Set(1L))
    // ...but the staged VIEW sees baseline + batch
    assert(SnapshotStore.readStaged(spark, root, id).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // publish: one atomic rename — now v2 IS the staged view
    val v = SnapshotStore.publishStaged(spark, root, id)
    assert(v == 2 && SnapshotStore.versions(spark, root) == Seq(1, 2))
    assert(SnapshotStore.read(spark, root).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // a second staging, discarded: no trace for readers or publishers
    val id2 = SnapshotStore.stageAppend(spark, root,
      Seq((3L, "c")).toDF("id", "v"))
    SnapshotStore.discardStaged(spark, root, id2)
    assert(SnapshotStore.versions(spark, root) == Seq(1, 2))
    intercept[IllegalArgumentException] {
      SnapshotStore.readStaged(spark, root, id2)
    }
    // and v1 history survived the whole dance
    assert(SnapshotStore.read(spark, root, asOf = Some(1)).collect()
      .map(_.getLong(0)).toSet == Set(1L))
  }

  test("warehouse_snapshot_diff: feed ops partition correctly (A22)") {
    val rows = ops.Scans.warehouseSnapshotDiff(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val (d12, d23) = rows.partition(_._1 == 1)
    // v1→v2 was a pure APPEND: the feed is inserts only, all %10==5
    assert(d12.nonEmpty && d12.forall(r => r._2 == 2 && r._3 == "I"))
    assert(d12.forall(_._4 % 10 == 5))
    // v2→v3 rebuild: updates exactly the %100==0 keys, deletes the rest
    val ups = d23.filter(_._3 == "U")
    val dels = d23.filter(_._3 == "D")
    assert(d23.nonEmpty && ups.forall(_._4 % 100 == 0))
    assert(dels.forall(r => r._4 % 100 != 0 && (r._4 % 10 == 0 || r._4 % 10 == 5)))
    assert(d23.count(_._3 == "I") == 0, "the rebuild's keys all pre-exist")
    // a change feed never reports an unchanged row: U rows moved value
    val full = ops.Scans.warehouseSnapshotDiff(spark, sfDir).collect()
    for (r <- full if r.getString(2) == "U")
      assert(r.getLong(4) != r.getLong(5))
  }
}
