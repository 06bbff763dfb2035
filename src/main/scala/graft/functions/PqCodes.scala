package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native-codegen product-quantization encoder for an `array<double>`
  * vector column: unit-normalize, then for each of the `m` subspaces
  * pick the nearest of its `ksub` centroids — all in ONE fused
  * per-row loop, returned as `array<int>` of length `m`.
  *
  * This is the extension-ladder rung for [[graft.ops.AnnPq.encode]]'s
  * expression formulation (`transform`/`zip_with`/`aggregate`): those
  * higher-order lambdas run INTERPRETED in Spark — measured 10-100×
  * slower than codegen on hot paths (see AnnLsh/MinHash scaladoc) —
  * and the PQ encode is the one pass that reads every raw vector of a
  * 100-TB corpus. Same discipline as [[HyperplaneCodes]]: a pure
  * per-row function belongs in a narrow codegen'd projection, with
  * the kernel shared between interpreted eval and generated code.
  *
  * Bit-equivalence contract with the expression path (pinned in
  * `AnnPqSpec`): the norm accumulates x² in ascending element order
  * (the `aggregate` fold order), each squared distance accumulates in
  * ascending dimension order (the `zip_with` + `aggregate` order),
  * and ties break to the LOWEST code (the
  * `array_position(d, array_min(d))` first-occurrence rule) — so the
  * two formulations can never disagree by float reassociation or
  * tie-break.
  *
  * NULL semantics: NULL vector → NULL; a NULL element → NULL; a
  * vector shorter than m·dsub → NULL (no partial-subspace codes).
  * The codebooks ride into generated code as a reference object
  * (`ctx.addReferenceObj`), not literal source — centroid count never
  * bloats the generated method past the JIT limit.
  */
case class PqCodes(child: Expression, books: Seq[Seq[Double]],
    m: Int, ksub: Int) extends UnaryExpression with ImplicitCastInputTypes {
  require(m >= 1 && ksub >= 1 && books.length == m * ksub,
    s"books must hold m*ksub=${m * ksub} centroids, got ${books.length}")
  require(books.forall(_.length == books.head.length),
    "all centroids must share one subspace dimensionality")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes = Seq(ArrayType(DoubleType))

  // value-class for codegen reference passing; Seq fields keep the
  // case-class value equality Catalyst uses for semanticEquals
  @transient private lazy val kernel =
    new PqCodes.Kernel(books.map(_.toArray).toArray, m, ksub)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("pqKernel", kernel, classOf[PqCodes.Kernel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = $kRef.compute($c);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** Shared kernel for interpreted eval AND generated code. One
    * instance per expression (codebooks pre-flattened to arrays). */
  final class Kernel(books: Array[Array[Double]], m: Int, ksub: Int)
      extends Serializable {
    private val dsub = books(0).length

    def compute(vec: ArrayData): ArrayData = {
      val n = vec.numElements()
      if (n < m * dsub) return null
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        i += 1
      }
      // norm over the FULL vector in ascending order — the aggregate
      // fold order of AnnPq.normalized
      var ss = 0.0
      i = 0
      while (i < n) {
        val x = vec.getDouble(i)
        ss += x * x
        i += 1
      }
      val norm = math.sqrt(ss)
      val codes = new Array[Int](m)
      var j = 0
      while (j < m) {
        var best = 0
        var bestD = Double.PositiveInfinity
        var k = 0
        while (k < ksub) {
          val c = books(j * ksub + k)
          var d = 0.0
          var t = 0
          while (t < dsub) {
            // (x/n) computed per use exactly as the normalized-column
            // expression does; zero-norm vectors normalize to zero
            val a = if (norm > 0) vec.getDouble(j * dsub + t) / norm else 0.0
            val diff = a - c(t)
            d += diff * diff
            t += 1
          }
          // strict < keeps the FIRST minimum — array_position tie rule
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        codes(j) = best
        j += 1
      }
      new GenericArrayData(codes)
    }
  }

  /** Column-level entry point from [[graft.ops.AnnPq.Codebooks]]. */
  def apply(vec: Column, books: Array[Array[Array[Double]]], ksub: Int): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec),
      books.flatten.map(_.toSeq).toSeq, books.length, ksub))
}
