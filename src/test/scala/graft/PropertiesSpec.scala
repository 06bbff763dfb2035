package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.census.Normalize
import graft.functions.SecondMax

/** ScalaCheck properties for the pure (driver-side) kernels — run
  * through scalacheck's own runner (no scalatestplus bridge in the
  * offline dependency set). */
class PropertiesSpec extends SparkTestBase {

  private def check(p: Prop, name: String): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  test("normalizeHeader is idempotent, dash-free, and trimmed") {
    check(Prop.forAll { (s: String) =>
      val once = Normalize.normalizeHeader(s)
      Normalize.normalizeHeader(once) == once &&
        !once.contains('-') && once == once.trim
    }, "normalizeHeader")
  }

  test("SecondMax reduce/merge over arbitrary splits equals sort-distinct reference") {
    val vals = Gen.listOf(Gen.chooseNum(-1000000L, 1000000L))
    check(Prop.forAll(vals, Gen.chooseNum(1, 5)) { (vs, nSplits) =>
      val expected = {
        val d = vs.distinct.sorted(Ordering[Long].reverse)
        if (d.length >= 2) d(1) else SecondMax.Unset
      }
      val parts =
        if (vs.isEmpty) Seq(Seq.empty[Long])
        else vs.grouped(math.max(1, vs.length / nSplits)).toSeq
      val buffers = parts.map(_.foldLeft(SecondMax.zero)(SecondMax.reduce))
      val merged = buffers.foldLeft(SecondMax.zero)(SecondMax.merge)
      SecondMax.finish(merged) == expected
    }, "SecondMax split-merge")
  }

  test("SecondMax merge is commutative") {
    val vals = Gen.listOf(Gen.chooseNum(-100L, 100L))
    check(Prop.forAll(vals, vals) { (a, b) =>
      val ba = a.foldLeft(SecondMax.zero)(SecondMax.reduce)
      val bb = b.foldLeft(SecondMax.zero)(SecondMax.reduce)
      SecondMax.finish(SecondMax.merge(ba, bb)) ==
        SecondMax.finish(SecondMax.merge(bb, ba))
    }, "SecondMax commutativity")
  }

  test("conformSchema: expected columns lead in order; no column lost") {
    // spot property over generated column subsets (pure schema logic)
    val cols = Gen.someOf(Seq("A", "B", "C", "D", "E")).map(_.toSeq)
    check(Prop.forAll(cols) { present =>
      present.isEmpty || {
        import org.apache.spark.sql.types._
        val schema = StructType(present.map(StructField(_, StringType)))
        val df = spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        val out = Normalize.conformSchema(df, Seq("A", "B", "C"))
        out.columns.take(3).toSeq == Seq("A", "B", "C") &&
          out.columns.toSet == present.toSet ++ Set("A", "B", "C")
      }
    }, "conformSchema")
  }
}
