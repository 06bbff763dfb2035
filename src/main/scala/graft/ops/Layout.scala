package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Util._

/** Data-layout operators — the write-side clustering the reference
  * delegates to its warehouse (`SORTKEY (state_fips, county, tract)`,
  * /root/reference/Test_census_tract.py:236-237, is a 1-dimensional
  * layout declaration). A Z-order (Morton) key generalizes that to
  * multiple dimensions: interleaving the bits of two sort keys gives a
  * single clustering key under which ranges of EITHER dimension stay
  * physically local, so per-file min/max statistics can skip files for
  * predicates on either column — the standard multi-dimensional
  * data-skipping layout (public: Morton 1966; used by every lakehouse
  * OPTIMIZE ZORDER implementation).
  *
  * Scale shape: the key is a pure per-row bit computation (codegen'd
  * built-ins, no shuffle); the layout write is one range partitioning
  * by the key — the same single-sort cost as the reference's SORTKEY,
  * but skippable in both dimensions.
  */
object Layout {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit lane (Morton spread, the classic magic-number dilation). */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key interleaving the low 16 bits of two dimensions
    * (`a` even bits, `b` odd bits). A production layout first
    * normalizes each dimension to a fixed-width rank; the fixture keys
    * already fit 16 bits. */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Cluster `df` for 2-dimensional data skipping: range-partition by
    * the Morton key of (a, b) and sort within partitions, so each
    * output file covers a bounded rectangle of BOTH key domains (the
    * property `ZorderSpec` pins). This is the engine-side equivalent
    * of the reference's warehouse SORTKEY, one dimension richer. */
  def zorderLayout(df: DataFrame, a: Column, b: Column,
      numPartitions: Int): DataFrame = {
    val withZ = df.withColumn("z", mortonKey(a.cast("long"), b.cast("long")))
    withZ.repartitionByRange(numPartitions, col("z"))
      .sortWithinPartitions(col("z"))
  }

  /** F7: Z-order layout audit over `lineitem(l_partkey, l_suppkey)` —
    * per 16-bit Z-prefix bucket (the "file" granularity): row count
    * and the min/max of each dimension. The min/max spans are exactly
    * the per-file statistics a scan would prune on; the curve bounds
    * every bucket to a ≤256×≤256 rectangle of the key domains
    * (bucket = top 16 interleaved bits = top 8 bits of each 16-bit
    * dimension), which `ZorderSpec` asserts. Pure bit arithmetic +
    * one partial-agg pass. */
  def layoutZorder(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        mortonKey(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
          .as("z"))
      .groupBy(shiftright(col("z"), 16).cast("int").as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
      .orderBy(col("z_bucket"))

  /** F10: zone-map file skipping over the F7 Z-order layout — the READ
    * side of the layout story: per Z-prefix "file", the per-file
    * min/max statistics ([[layoutZorder]]'s spans) decide whether a
    * predicate can touch the file at all, BEFORE any data is read —
    * the Delta/Iceberg data-skipping core, and the reason the Z-order
    * write was worth its sort. For the declared one-dimensional
    * predicate `l_partkey BETWEEN lo AND hi`, a file is a CANDIDATE
    * when its [min_part, max_part] zone overlaps the range; the query
    * reports, in one summary row, how many of the files a zone-mapped
    * scan would open (`n_candidate_files`), how many actually hold
    * matches, and the row mass scanned vs matched — plus the SOUNDNESS
    * column `rows_missed` (matching rows in PRUNED files), which the
    * zone-map overlap rule forces to 0 and the oracle re-proves.
    *
    * Scale shape: the zone-map relation is METADATA (one row per
    * file); building it here is one partial-agg pass (in production it
    * is written once at layout time and the scan planner only reads
    * it). Z-order bounds every file to a ≤256-wide part range, so the
    * candidate set is a small fraction of the files — the measured
    * prune ratio IS the query's payload. */
  def layoutZonemapSkip(spark: SparkSession, sfDir: String,
      lo: Long = 400L, hi: Long = 480L): DataFrame = {
    val zones = t(spark, sfDir, "lineitem")
      .select(col("l_partkey"),
        mortonKey(col("l_partkey").cast("long"), col("l_suppkey").cast("long"))
          .as("z"))
      .select(col("l_partkey"), shiftright(col("z"), 16).cast("int").as("file_id"),
        when(col("l_partkey").between(lo, hi), 1L).otherwise(0L).as("m"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        sum(col("m")).as("n_match"))
    val cand = col("max_part") >= lo && col("min_part") <= hi
    zones.agg(
      count(lit(1)).as("n_files"),
      sum(when(cand, 1L).otherwise(0L)).as("n_candidate_files"),
      sum(when(col("n_match") > 0, 1L).otherwise(0L)).as("n_matching_files"),
      sum(col("n_rows")).as("rows_total"),
      sum(when(cand, col("n_rows")).otherwise(0L)).as("rows_scanned"),
      sum(col("n_match")).as("rows_matched"),
      sum(when(!cand, col("n_match")).otherwise(0L)).as("rows_missed"))
  }

  /** F14: clustering-QUALITY metric — the "should we OPTIMIZE" number
    * (Delta/Iceberg clustering depth): for the same rows under two
    * layouts — arrival order (file = orderkey mod 32: every file
    * spans the whole part-key domain) and Z-order (the F10 rule:
    * file = top interleaved bits) — the average number of files whose
    * [min,max] part-key zones OVERLAP each file's zone. A point probe
    * must open every overlapping file, so avg_overlap IS the expected
    * read amplification; arrival ≈ n_files (no zone helps), Z-order
    * ≈ small constant — the before/after that justifies an A39
    * rewrite. All counts exact integers; one IEEE division per
    * layout.
    *
    * Scale shape: two partial aggs to file cardinality, then a
    * file×file self-join per layout — bounded by the FILE count
    * (metadata cardinality, never rows; the zone-map table any lake
    * keeps). */
  def layoutClusterMetric(spark: SparkSession, sfDir: String): DataFrame = {
    val base = t(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"),
        mortonKey(col("l_partkey").cast("long"),
          col("l_suppkey").cast("long")).as("z"))
    def zonesOf(layout: String, fid: org.apache.spark.sql.Column) =
      base.groupBy(fid.as("fid"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("mn"), max(col("l_partkey")).as("mx"))
        .select(lit(layout).as("layout"), col("fid"), col("mn"), col("mx"))
    val zones = zonesOf("arrival", col("l_orderkey") % 32)
      .unionByName(zonesOf("zorder",
        shiftright(col("z"), 16).cast("long")))
      .localCheckpoint(true)
    val pairs = zones.as("a")
      .join(zones.as("b"),
        col("a.layout") === col("b.layout") &&
          col("a.mx") >= col("b.mn") && col("a.mn") <= col("b.mx"))
      .groupBy(col("a.layout").as("layout"))
      .agg(count(lit(1)).as("n_overlaps"))
    zones.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("mx") - col("mn")).as("span_sum"))
      .join(pairs, "layout")
      .select(col("layout"), col("n_files"), col("span_sum"),
        round(col("n_overlaps").cast("double") /
          col("n_files").cast("double"), 6).as("avg_overlap"))
      .orderBy(col("layout"))
  }

  /** The compaction banding rule — ONE definition, applied by the
    * distributed planner ([[layoutCompaction]], via prefix sum) and
    * the filesystem executor ([[compact]], via this fold): files are
    * taken in deterministic order within a partition and grouped by
    * the `target`-sized byte WINDOW their start offset falls in
    * (group index = floor(bytes-before-this-file / target)). Chosen
    * over true greedy refill because it is a pure function of the
    * prefix sum — one codegen'd DIV, no sequential reset state — and
    * it keeps the bound OPTIMIZE actually needs: occupied windows are
    * a subset of 0..floor(total/target), so a partition compacts to
    * at most `total_bytes DIV target + 1` files. A group may
    * under-fill by at most its predecessor's overflow (the window a
    * large file runs into holds less of its own budget); that slack
    * is bounded by the largest single file and does not accumulate. */
  def bandBySize(sizes: Seq[Long], target: Long): Seq[Int] = {
    var cum = 0L
    sizes.map { b => val g = (cum / target).toInt; cum += b; g }
  }

  /** F9: small-file compaction PLAN — the OPTIMIZE movement the
    * streaming sinks (J9 idempotent appends, J15 CDC upserts) make
    * necessary: every micro-batch writes a file per task, and a
    * 100 TB table accretes millions of under-sized files that
    * dominate scan open/seek cost. The file inventory here is
    * synthesized deterministically from the events table (partition =
    * event date, one file per writer task = user_id mod 50, file size
    * = Σ per-row byte estimate) so the PLANNER itself — the banding,
    * the per-partition accounting, the moved-bytes bill — is
    * oracle-checked end to end; [[compact]] applies the identical
    * rule to a real directory tree.
    *
    * Per partition: file count before/after, groups that actually
    * merge (≥ 2 members), and the bytes a rewrite would move —
    * single-file groups cost nothing, which is what makes OPTIMIZE
    * incremental. Scale shape: the inventory is METADATA (3 narrow
    * columns, one row per file — millions of rows for a 100 TB
    * table, not billions); the running total is [[Strata.prefixSum]]'s
    * two-pass range-bucketed prefix sum, so no partition's file list
    * ever serializes through one task, and the banding itself is one
    * codegen'd integer DIV. */
  def layoutCompaction(spark: SparkSession, sfDir: String,
      target: Long = 8192L): DataFrame = {
    val files = t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("part"),
        pmod(col("user_id"), lit(50L)).as("file_id"),
        (lit(64L) + length(coalesce(col("props"), lit("")))).as("row_bytes"))
      .groupBy(col("part"), col("file_id"))
      .agg(sum(col("row_bytes")).as("bytes"))
    val banded = Strata.prefixSum(files, Seq("part"), "file_id", "bytes",
        out = "cum")
      .withColumn("grp", expr(s"(cum - bytes) DIV $target"))
    banded.groupBy(col("part"), col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bytes"))
      .groupBy(col("part"))
      .agg(sum(col("n_files")).as("n_files"),
        count(lit(1)).as("n_groups"),
        sum(when(col("n_files") > 1, 1L).otherwise(0L)).as("n_compacted_groups"),
        sum(col("bytes")).as("bytes_total"),
        sum(when(col("n_files") > 1, col("bytes")).otherwise(0L)).as("bytes_moved"))
      .orderBy(col("part"))
  }

  /** F12: DELETE planning / write-amplification report — the cost
    * estimate a GDPR-erasure or DML DELETE run files before touching
    * data: copy-on-write parquet cannot delete a row in place, it
    * rewrites every FILE containing a matching row, so the real bill
    * is `bytes_rewritten` (whole touched files), not `bytes_deleted`.
    * Over the same synthesized inventory as F9 (partition = event
    * date, file = writer task `user_id mod 50`), with the erasure key
    * set `user_id % 97 = 0`, report per partition: files total vs
    * touched, rows deleted, bytes deleted vs rewritten, and the
    * amplification ratio — the number that justifies deletion vectors
    * (merge-on-read) once it exceeds the read-side penalty.
    *
    * Scale shape: one narrow pass tags each row, one partial agg to
    * file granularity (METADATA cardinality), one to partitions; the
    * amplification division is the proven exact-decimal final. The
    * plan is the same movement a lakehouse DELETE's file-pruning
    * phase runs off column statistics. */
  def layoutDeletePlan(spark: SparkSession, sfDir: String): DataFrame = {
    val files = t(spark, sfDir, "events")
      .select(to_date(col("ts")).as("part"),
        pmod(col("user_id"), lit(50L)).as("file_id"),
        (lit(64L) + length(coalesce(col("props"), lit("")))).as("row_bytes"),
        (col("user_id") % 97 === 0).as("del"))
      .groupBy(col("part"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"), sum(col("row_bytes")).as("bytes"),
        sum(when(col("del"), 1L).otherwise(0L)).as("n_del"),
        sum(when(col("del"), col("row_bytes")).otherwise(0L)).as("del_bytes"))
    files.groupBy(col("part"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("n_del") > 0, 1L).otherwise(0L)).as("n_files_touched"),
        sum(col("n_del")).as("rows_deleted"),
        sum(col("del_bytes")).as("bytes_deleted"),
        sum(when(col("n_del") > 0, col("bytes")).otherwise(0L))
          .as("bytes_rewritten"))
      .select(col("part"), col("n_files"), col("n_files_touched"),
        col("rows_deleted"), col("bytes_deleted"), col("bytes_rewritten"),
        when(col("bytes_deleted") > 0,
          dbl(dec(col("bytes_rewritten")) / col("bytes_deleted")))
          .as("amplification"))
      .orderBy(col("part"))
  }

  /** Apply [[bandBySize]] to a real partitioned parquet root: per
    * partition directory, files (name-ordered) band into groups and
    * every ≥ 2-member group is rewritten as ONE file (read members →
    * coalesce(1) → staged write → atomic rename into the partition
    * dir, then delete the members). Single-file groups are untouched.
    * The listing and the group loop are driver-side METADATA work —
    * the same division of labor as every lakehouse OPTIMIZE (the
    * planner reads the file manifest; only the rewrites are cluster
    * jobs). Returns (files_before, files_after). */
  def compact(spark: SparkSession, root: String, target: Long): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(rootPath).filter(_.isDirectory)
      .filterNot(_.getPath.getName.startsWith("."))
    var before = 0
    var after = 0
    for (dir <- partDirs) {
      val files = fs.listStatus(dir.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
      before += files.length
      val groups = bandBySize(files.toSeq.map(_.getLen), target)
        .zip(files).groupBy(_._1).toSeq.sortBy(_._1)
      for ((g, members) <- groups) {
        if (members.length < 2) after += members.length
        else {
          val tmp = new Path(dir.getPath, s".compact-$g-staging")
          spark.read.parquet(members.map(_._2.getPath.toString): _*)
            .coalesce(1)
            .write.mode("overwrite").parquet(tmp.toString)
          val partFile = fs.listStatus(tmp)
            .map(_.getPath).find(_.getName.startsWith("part-"))
            .getOrElse(sys.error(s"no output file under $tmp"))
          val dest = new Path(dir.getPath, s"compacted-$g-${partFile.getName}")
          require(fs.rename(partFile, dest), s"rename $partFile -> $dest failed")
          members.foreach(m => fs.delete(m._2.getPath, false))
          require(fs.delete(tmp, true), s"staging cleanup of $tmp failed")
          after += 1
        }
      }
    }
    (before, after)
  }
}
