package graft.ops

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
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
  * driver-side parameter to every query. Cell assignment is one MLlib
  * transform (narrow); probing reads only ~Probes/K of the data via a
  * pushable `cell IN (...)` filter. Seeded, so one codebook is
  * self-consistent; cross-run cell ids are an implementation detail
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
    // driver-side: distance of the query to each of the K centers
    val qArr = qVec.map(_.toDouble).toArray
    val probeCells = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qArr)
          .map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy { case (i, d) => (d, i) }
      .take(Probes).map(_._1)
    val qLit = array(qVec.map(lit).toIndexedSeq: _*)
    assigned
      .filter(col("cell").isin(probeCells.toIndexedSeq: _*))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(AnnLsh.cosine(col(vecCol).cast("array<double>"),
          qLit.cast("array<double>")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

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
}
