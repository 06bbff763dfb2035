package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbors — the trained
  * coarse-quantizer alternative to the sign-LSH of [[AnnLsh]]:
  * a seeded k-means codebook partitions the vectors into K cells, each
  * query probes only the `Probes` nearest cells and re-ranks the
  * bucket members with exact cosine (the IVF-Flat design of the public
  * FAISS literature, Johnson et al., "Billion-scale similarity search
  * with GPUs", 2017).
  *
  * Scale shape: the codebook is fit ONCE on a seeded sample (k-means
  * needs only enough points to place K centers — at 100 TB that is a
  * thin sample, never the full table; the fit input is cached because
  * Lloyd's algorithm re-reads it every iteration) and is then a
  * driver-side parameter to every query. The index build
  * ([[buildIndex]]) assigns a cell to every vector ONCE (one narrow
  * MLlib transform) and writes the assignment table PARTITIONED BY
  * `cell`, so the online probe ([[probeIndex]]) reads only the
  * `Probes` matching partition directories — `cell IN (...)` is a
  * partition filter, never a per-row predicate over the full corpus
  * (pinned by the `numPartitions` scan metric in `PlanAuditSpec`).
  * The transform-per-call [[ivfTopK]] form stays as the index-free
  * path for in-memory inputs and unit tests. Seeded, so one codebook
  * is self-consistent; cross-run cell ids are an implementation detail
  * (the op is registered rows-only and pinned by planted-neighbor
  * tests in `AnnIvfSpec`).
  */
object AnnIvf {
  val K = 16
  val Probes = 2
  /** Fixture-scale sample for the codebook fit — enough points per
    * center (500 × 0.25 ≈ 8/cell) while keeping the fit off the full
    * table, mirroring the production sampled-fit shape. */
  val FitSampleFraction = 0.25

  /** Seeded k-means codebook over a (seeded) sample of the embedding
    * column. `sampleFraction = 1.0` fits on everything — only sensible
    * for tiny inputs and unit tests. */
  def codebook(df: DataFrame, vecCol: String,
      sampleFraction: Double = 1.0, seed: Long = 1L): KMeansModel = {
    val base =
      if (sampleFraction < 1.0) df.sample(withReplacement = false, sampleFraction, seed)
      else df
    val fit = base.select(array_to_vector(col(vecCol)).as("fv")).cache()
    // k-means|| init places centers near-converged, so few Lloyd
    // iterations are needed; each iteration is one Spark job over the
    // cached sample, so the cap is latency, not quality
    try
      new KMeans()
        .setK(K).setSeed(1L).setMaxIter(5)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(fit)
    finally { fit.unpersist(); () }
  }

  /** Approximate top-k neighbors of `queryId` under a pre-fit codebook:
    * probe the `Probes` nearest cells, re-rank with exact cosine. The
    * query itself only assigns + probes — no training in the query
    * path. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, model: KMeansModel): DataFrame = {
    val assigned = model.transform(df.withColumn("fv", array_to_vector(col(vecCol))))
    val qVec = df.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    rerank(assigned.filter(col("cell").isin(probeCells(qVec, model): _*)),
      idCol, vecCol, qVec, k, excludeId = Some(queryId))
  }

  /** Driver-side: the `probes` centers nearest to the query vector —
    * K scalar distance computations, never a Spark job. `probes` is
    * the IVF recall dial (FAISS `nprobe`): more probed cells read more
    * partitions and recover more of the true neighbors; `probes = K`
    * is exhaustive and must reproduce brute force exactly (pinned in
    * `GroundTruthSpec` at sf0.1). */
  def probeCells(qVec: Seq[Float], model: KMeansModel,
      probes: Int = Probes): Seq[Int] = {
    val qArr = qVec.map(_.toDouble).toArray
    model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qArr)
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }
      .take(probes).map(_._1).toIndexedSeq
  }

  /** Exact-cosine re-rank of an (already cell-pruned) candidate frame. */
  private def rerank(candidates: DataFrame, idCol: String, vecCol: String,
      qVec: Seq[Float], k: Int, excludeId: Option[Long]): DataFrame = {
    val qLit = array(qVec.map(lit).toIndexedSeq: _*)
    excludeId.fold(candidates)(q => candidates.filter(col(idCol) =!= q))
      .select(col(idCol),
        round(AnnLsh.cosine(col(vecCol).cast("array<double>"),
          qLit.cast("array<double>")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Offline index build: assign every vector its cell ONCE and write
    * the assignment table partitioned by `cell`. This is the IVF-Flat
    * inverted file itself — the corpus re-laid-out by posting list, the
    * standard storage trade of the FAISS design. One narrow transform +
    * one write; after this no query ever re-assigns the corpus. */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
      model: KMeansModel, path: String): Unit =
    model.transform(df.withColumn("fv", array_to_vector(col(vecCol))))
      .select(col(idCol), col(vecCol), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Online probe against a materialized index: read ONLY the `Probes`
    * partition directories (`cell IN (...)` is a partition filter —
    * directory-level skip, ~Probes/K of the data touched), then exact-
    * cosine re-rank. The query vector is a caller-supplied parameter,
    * as in a real ANN serving path. */
  def probeIndex(spark: SparkSession, indexPath: String, idCol: String,
      vecCol: String, qVec: Seq[Float], k: Int, model: KMeansModel,
      excludeId: Option[Long] = None, probes: Int = Probes): DataFrame =
    rerank(
      spark.read.parquet(indexPath)
        .filter(col("cell").isin(probeCells(qVec, model, probes): _*)),
      idCol, vecCol, qVec, k, excludeId)

  /** Convenience form: sampled-seeded fit, then assign + probe. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame =
    ivfTopK(df, idCol, vecCol, queryId, k,
      codebook(df, vecCol, FitSampleFraction))

  /** Persist a fitted codebook — the offline index-build artifact of a
    * production IVF deployment (fit once on a sample, save, serve every
    * query from the loaded model; the fit never runs in the query
    * path). MLlib-native persistence: metadata + centers land under
    * `path` as parquet, loadable from any executor-visible FS. */
  def saveCodebook(model: KMeansModel, path: String): Unit =
    model.write.overwrite().save(path)

  /** Load a persisted codebook for the online query path
    * ([[ivfTopK]]). Round-trip identity is pinned in `AnnIvfSpec`. */
  def loadCodebook(path: String): KMeansModel = KMeansModel.load(path)

  /** Deterministic per-fixture cache dir for [[ensureIndex]] — keyed
    * by the source path AND the source parquet's content identity
    * ([[FixtureCache.contentKey]]), so a fixture regenerated in place
    * gets a fresh index instead of stale cell assignments. */
  def indexCacheDir(spark: SparkSession, sourceDir: String): String =
    FixtureCache.cacheDir(spark.sessionState.newHadoopConf(),
      "ivf_index_v1", sourceDir, Seq(s"$sourceDir.parquet"))

  /** Build-once index bootstrap: if `cacheDir` holds a completed index,
    * load its codebook; otherwise fit the sampled codebook, persist it,
    * write the cell-partitioned assignment table — all into a unique
    * `.tmp_` staging sibling with the marker written LAST, then one
    * atomic whole-dir rename into place (the [[FixtureCache]] commit
    * discipline: a crashed build is rebuilt, a cross-process racing
    * build is discarded in favor of the winner's committed copy, and
    * half-written interleaved indexes are structurally impossible).
    * Returns the model; the assignment table is `assignedPath(cacheDir)`.
    * All FS access goes through the Hadoop `FileSystem` of the session,
    * so the cache root may be any executor-visible FS, not just the
    * driver's local disk. */
  def ensureIndex(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, cacheDir: String,
      sampleFraction: Double = FitSampleFraction): KMeansModel =
    AnnIvf.synchronized {
      val dst = new Path(cacheDir)
      val fs = dst.getFileSystem(spark.sessionState.newHadoopConf())
      val marker = new Path(dst, "_GRAFT_INDEX_READY")
      if (fs.exists(marker)) loadCodebook(codebookPath(cacheDir))
      else {
        // dst without a marker is debris from a crashed pre-commit build
        if (fs.exists(dst)) { fs.delete(dst, true); () }
        val tmp = new Path(
          cacheDir + ".tmp_" + java.util.UUID.randomUUID().toString.take(8))
        val model = codebook(df, vecCol, sampleFraction)
        saveCodebook(model, codebookPath(tmp.toString))
        buildIndex(df, idCol, vecCol, model, assignedPath(tmp.toString))
        fs.create(new Path(tmp, "_GRAFT_INDEX_READY"), true).close()
        val renamed = if (!fs.exists(dst)) fs.rename(tmp, dst) else false
        if (!renamed) { fs.delete(tmp, true); () }
        // a concurrent committer may have landed between our exists
        // check and our rename, nesting ours under theirs — undo
        val nested = new Path(dst, tmp.getName)
        if (fs.exists(nested)) { fs.delete(nested, true); () }
        if (!fs.exists(marker))
          throw new IllegalStateException(
            s"IVF index commit failed for $cacheDir (no committed copy)")
        // serve the COMMITTED copy (ours, or the race winner's)
        loadCodebook(codebookPath(cacheDir))
      }
    }

  def codebookPath(cacheDir: String): String = s"$cacheDir/codebook"
  def assignedPath(cacheDir: String): String = s"$cacheDir/assigned"
}
