package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-random-hyperplane LSH over embedding columns (Charikar, STOC
  * 2002 — cosine LSH from public literature): the scale path for
  * similarity search that the brute-force `sim_topk` baseline can't
  * provide at 100 TB.
  *
  * Each vector gets `Tables` independent codes of `BitsPerTable` sign
  * bits (bit = sign of the dot product with a fixed-seed Gaussian
  * hyperplane); two vectors collide in a table iff all its bits agree,
  * with per-bit agreement 1 - θ/π. Candidates are generated per
  * (table, code) bucket and re-ranked with exact cosine, so LSH costs
  * recall only, never precision.
  *
  * Implementation is codegen-friendly throughout: posexplode the
  * vector once, compute all `Tables × BitsPerTable` hyperplane dots as
  * plain sum-aggregate columns (hyperplanes are array literals indexed
  * by dimension), fold sign bits into integer codes, and expand
  * buckets via sorted collect_list — no interpreted higher-order
  * lambdas and no self-join on the heavy vector data.
  */
object AnnLsh {
  /** Fixture embedding dimensionality. */
  val Dim = 64
  /** 4 independent tables of up to 16 sign bits. Callers pick the code
    * width per use case: FINE codes (16 bits → 65k buckets) for
    * near-dup dedup, where only near-identical vectors should collide
    * and candidate volume must stay linear; a COARSE prefix (8 bits)
    * of the same hyperplanes for ANN search, where recall over
    * moderately-similar vectors matters. (6-bit dedup codes measured
    * ~780k candidate pairs on 5000 random vectors — quadratic
    * blowup; 16-bit codes keep it to a few hundred.) */
  val Tables = 4
  val MaxBitsPerTable = 16
  val DedupBits = 16
  val AnnBits = 8

  /** Fixed-seed Gaussian hyperplanes — deterministic across JVMs. */
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(987654321L)
    Array.fill(Tables * MaxBitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** (id, table_id, code) rows for an (id, float-array) DataFrame,
    * using the first `bits` hyperplanes of each table (coarser codes
    * are prefixes of finer ones).
    *
    * Shaped as a broadcast join against the hyperplane matrix as
    * (table, bit, pos, weight) rows: explode the vector once, multiply
    * through the join, partial-sum to per-(id, table, bit) dots, then
    * OR the sign bits via a non-overlapping bit sum — every stage is a
    * codegen'd hash aggregate with map-side combine. (The previous
    * shape — one wide agg with `Tables × bits` sum columns, each
    * indexing a 64-double literal array — generated pathological code
    * and measured ~12s at sf0.1; this shape is ~1s.) */
  def codes(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = DedupBits): DataFrame = {
    require(bits >= 1 && bits <= MaxBitsPerTable)
    val spark = df.sparkSession
    import spark.implicits._
    val planeRows = for {
      t <- 0 until Tables
      b <- 0 until bits
      (w, p) <- planes(t * MaxBitsPerTable + b).zipWithIndex
    } yield (t, b, p, w)
    val planesDf = planeRows.toDF("table_id", "bit", "pos", "w")
    df.select(col(idCol), posexplode(col(vecCol)))
      .select(col(idCol), col("pos"), col("col").cast("double").as("x"))
      .join(broadcast(planesDf), Seq("pos"))
      .groupBy(col(idCol), col("table_id"), col("bit"))
      .agg(sum(col("x") * col("w")).as("dot"))
      .groupBy(col(idCol), col("table_id"))
      .agg(sum(when(col("dot") > 0, expr("shiftleft(1, bit)")).otherwise(lit(0)))
        .cast("int").as("code"))
  }

  /** Exact cosine between two double-array columns (plain IEEE double —
    * used for re-ranking candidates, not for oracle comparison). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Approximate nearest neighbors of one query vector: every vector
    * sharing a (table, code) bucket with the query is a candidate;
    * candidates are re-ranked by exact cosine. One narrow pass over
    * the data + a broadcast-sized candidate set — never a crossJoin. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val cs = codes(df, idCol, vecCol, AnnBits)
    val qCodes = cs.filter(col(idCol) === queryId)
      .select(col("table_id"), col("code"))
    val candIds = cs.filter(col(idCol) =!= queryId)
      .join(broadcast(qCodes), Seq("table_id", "code"))
      .select(col(idCol)).distinct()
    val qVec = df.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val qLit = array(qVec.map(lit).toIndexedSeq: _*)
    df.join(candIds, Seq(idCol))
      .select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"),
          qLit.cast("array<double>")), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    * minCos): LSH buckets → sorted-bucket pair expansion → exact
    * cosine verification via a single pair-melt join. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame = {
    val buckets = codes(df, idCol, vecCol, DedupBits)
      .groupBy(col("table_id"), col("code"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
    val cand = buckets
      .select(explode(Buckets.sortedPairs(col("ids"))).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("mid"), col(vecCol).cast("array<double>").as("v"))
    cand
      .select(col("id_a"), col("id_b"),
        explode(array(col("id_a"), col("id_b"))).as("mid"))
      .join(vecs, Seq("mid"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sort_array(collect_list(struct(col("mid"), col("v")))).as("m"))
      .select(col("id_a"), col("id_b"),
        round(cosine(
          element_at(col("m"), 1).getField("v"),
          element_at(col("m"), 2).getField("v")), 6).as("cos"))
      .filter(col("cos") >= minCos)
      .orderBy(col("id_a"), col("id_b"))
  }
}
