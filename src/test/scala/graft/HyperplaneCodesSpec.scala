package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.HyperplaneCodes

/** The native [[graft.functions.HyperplaneCodes]] expression: codegen
  * result vs a plain-Scala reference over the shared plane matrix,
  * NULL semantics, and the coarse-codes-are-prefixes property the ANN
  * path relies on (8-bit search codes prefix the 16-bit dedup codes). */
class HyperplaneCodesSpec extends SparkTestBase {

  /** Plain-Scala reference: sign bits of dimension-order dots. */
  private def reference(vec: Seq[Double], tables: Int, bits: Int): Seq[Int] =
    (0 until tables).map { t =>
      (0 until bits).foldLeft(0) { (acc, b) =>
        val p = HyperplaneCodes.planes(t * HyperplaneCodes.MaxBitsPerTable + b)
        val dot = vec.take(HyperplaneCodes.Dim).zipWithIndex
          .foldLeft(0.0) { case (s, (x, i)) => s + x * p(i) }
        if (dot > 0) acc | (1 << b) else acc
      }
    }

  private def viaSpark(vecs: Seq[Seq[Double]], tables: Int, bits: Int): Seq[Seq[Int]] = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("v", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.zipWithIndex.map { case (v, i) => Row(Int.box(i), v) }, 2),
      schema)
    df.select(col("id"), HyperplaneCodes(col("v"), tables, bits).as("codes"))
      .orderBy("id").collect().map(_.getSeq[Int](1)).toSeq
  }

  test("codegen codes equal the plain-Scala reference (multiple operating points)") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(64)(rnd.nextGaussian()))
    for ((tables, bits) <- Seq((8, 16), (4, 8), (1, 1))) {
      val got = viaSpark(vecs, tables, bits)
      val want = vecs.map(reference(_, tables, bits))
      assert(got == want, s"($tables tables, $bits bits)")
    }
  }

  test("coarser codes are prefixes of finer codes (ANN ⊂ dedup planes)") {
    val rnd = new scala.util.Random(11)
    val vecs = Seq.fill(20)(Seq.fill(64)(rnd.nextGaussian()))
    val fine = viaSpark(vecs, 4, 16)
    val coarse = viaSpark(vecs, 4, 8)
    for ((f, c) <- fine.zip(coarse))
      assert(f.map(_ & 0xFF) == c, "8-bit code must be the 16-bit low byte")
  }

  test("NULL vector and NULL element both yield NULL (not a partial code)") {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("v", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      Row(Int.box(0), null),
      Row(Int.box(1), Seq[Any](1.0, null) ++ Seq.fill[Any](62)(0.5)),
      Row(Int.box(2), Seq.fill[Any](64)(0.5)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val got = df.select(col("id"), HyperplaneCodes(col("v"), 2, 4).as("c"))
      .orderBy("id").collect()
      .map(r => r.getInt(0) -> r.isNullAt(1)).toSeq
    assert(got == Seq(0 -> true, 1 -> true, 2 -> false))
  }

  test("short and long vectors: planes prefix / extra dims ignored") {
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(64)(rnd.nextGaussian())
    // extra dims beyond the 64-wide plane matrix must not change codes
    val long = base ++ Seq(9.9, -9.9)
    assert(viaSpark(Seq(long), 2, 8) == viaSpark(Seq(base), 2, 8))
    // a 32-dim vector uses the planes' 32-dim prefix
    val short = base.take(32)
    assert(viaSpark(Seq(short), 2, 8).head == reference(short, 2, 8))
  }

  test("operating-point bounds are rejected at construction") {
    intercept[IllegalArgumentException] {
      viaSpark(Seq(Seq.fill(64)(0.1)), 0, 8)
    }
    intercept[IllegalArgumentException] {
      viaSpark(Seq(Seq.fill(64)(0.1)), 2, 17)
    }
  }
}
