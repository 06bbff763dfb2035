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
  * Scale shape: cell assignment is one MLlib transform (narrow);
  * probing reads only ~Probes/K of the data via a pushable
  * `prediction IN (...)` filter; the codebook is tiny and lives on the
  * driver. At 100 TB the fit runs on a sample — here it trains on the
  * full (small) fixture table. Seeded, so one run is self-consistent;
  * cross-run cell ids are an implementation detail (the op is
  * registered rows-only and pinned by planted-neighbor tests).
  */
object AnnIvf {
  val K = 16
  val Probes = 2

  /** Seeded k-means codebook over the embedding column. */
  def codebook(df: DataFrame, vecCol: String): KMeansModel =
    new KMeans()
      .setK(K).setSeed(1L).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(df.select(array_to_vector(col(vecCol)).as("fv")))

  /** Approximate top-k neighbors of `queryId`: probe the `Probes`
    * nearest cells, re-rank with exact cosine. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val m = codebook(df, vecCol)
    val assigned = m.transform(df.withColumn("fv", array_to_vector(col(vecCol))))
    val qVec = df.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    // driver-side: distance of the query to each of the K centers
    val qArr = qVec.map(_.toDouble).toArray
    val probeCells = m.clusterCenters.zipWithIndex
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
}
