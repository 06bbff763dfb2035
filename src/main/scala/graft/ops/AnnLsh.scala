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
  /** 4 independent tables × 6 bits: ~(cosθ-dependent)^6 per-table
    * collision — coarse enough to yield candidates on unrelated data,
    * sharp enough that near-identical vectors collide in every table. */
  val Tables = 4
  val BitsPerTable = 6

  /** Fixed-seed Gaussian hyperplanes — deterministic across JVMs. */
  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(987654321L)
    Array.fill(Tables * BitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  private def planeLit(i: Int): Column = array(planes(i).map(lit).toIndexedSeq: _*)

  /** (id, table_id, code) rows for an (id, float-array) DataFrame. */
  def codes(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val exploded = df
      .select(col(idCol), posexplode(col(vecCol)))
      .select(col(idCol), col("pos"), col("col").cast("double").as("x"))
    val dots = (0 until Tables * BitsPerTable).map { i =>
      sum(col("x") * element_at(planeLit(i), col("pos") + 1)).as(s"d_$i")
    }
    val agged = exploded.groupBy(col(idCol)).agg(dots.head, dots.tail: _*)
    val tableCodes = (0 until Tables).map { t =>
      (0 until BitsPerTable).map { b =>
        when(col(s"d_${t * BitsPerTable + b}") > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce(_.bitwiseOR(_)).as(s"code_$t")
    }
    agged.select((col(idCol) +: tableCodes): _*)
      .select(col(idCol), explode(array((0 until Tables).map(t =>
        struct(lit(t).as("table_id"), col(s"code_$t").as("code"))): _*)).as("tc"))
      .select(col(idCol), col("tc.table_id"), col("tc.code"))
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
    val cs = codes(df, idCol, vecCol)
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
    val buckets = codes(df, idCol, vecCol)
      .groupBy(col("table_id"), col("code"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
    val cand = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
          struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
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
