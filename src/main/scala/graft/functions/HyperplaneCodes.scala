package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native-codegen sign-hyperplane LSH codes for an `array<double>`
  * vector column: all `tables` codes (each `bits` sign bits against
  * the shared fixed-seed Gaussian plane matrix) in ONE fused per-row
  * loop, returned as `array<int>` of length `tables`.
  *
  * This replaces the distributed formulation in `AnnLsh.codes`
  * (posexplode each vector to `dim` rows → broadcast-join the
  * (table, bit, pos, weight) plane rows → two hash aggregations) with
  * a narrow projection. The old shape was the best PURE-SQL plan, but
  * it still shuffled `corpus × tables × bits` partial-dot rows into
  * the first aggregation — at 100 TB that shuffle IS the job. A
  * scalar expression is the right rung of the extension ladder here
  * (SURVEY §7.3: native Expression > composed ops when the
  * composition forces a shuffle that the semantics don't need): the
  * codes are a pure per-row function of the vector.
  *
  * Dot products accumulate in ascending dimension order — the same
  * order as the driver-side query-code path (`AnnLsh.queryCodes`), so
  * corpus codes and probe codes can never disagree by float
  * reassociation.
  *
  * NULL semantics: NULL vector → NULL; a NULL element → NULL (the
  * sign of a partial dot is not the sign of the vector's dot).
  * Dimensions beyond the plane matrix's [[HyperplaneCodes.Dim]] are
  * ignored, shorter vectors use the planes' prefix — matching the
  * join-on-`pos` behavior of the distributed shape.
  */
case class HyperplaneCodes(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(tables >= 1 && tables <= HyperplaneCodes.MaxTables,
    s"tables must be in [1, ${HyperplaneCodes.MaxTables}], got $tables")
  require(bits >= 1 && bits <= HyperplaneCodes.MaxBitsPerTable,
    s"bits must be in [1, ${HyperplaneCodes.MaxBitsPerTable}], got $bits")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // AbstractDataType is private[sql]; inferred type is fine (CosineSim
  // precedent)
  override def inputTypes = Seq(ArrayType(DoubleType))

  override def nullSafeEval(input: Any): Any =
    HyperplaneCodes.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("codes")
      // the loop body lives in the shared compute() (also the
      // interpreted path) — the generated call keeps this expression
      // inside whole-stage codegen without duplicating the kernel
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.HyperplaneCodes.compute($c, $tables, $bits);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneCodes =
    copy(child = newChild)
}

object HyperplaneCodes {
  /** Plane-matrix dimensionality (fixture embedding width). */
  val Dim = 64
  val MaxTables = 8
  val MaxBitsPerTable = 16

  /** Fixed-seed Gaussian hyperplanes — deterministic across JVMs;
    * indexed [table * MaxBitsPerTable + bit][dimension]. The single
    * source shared by this expression (corpus side) and
    * `AnnLsh.queryCodes` (driver-side probe codes). */
  val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(987654321L)
    Array.fill(MaxTables * MaxBitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** Shared kernel for interpreted eval AND generated code (called via
    * the companion's static forwarder). Returns null on a NULL
    * element. */
  def compute(vec: ArrayData, tables: Int, bits: Int): ArrayData = {
    val lim = math.min(vec.numElements(), Dim)
    var i = 0
    while (i < lim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var code = 0
      var b = 0
      while (b < bits) {
        val p = planes(t * MaxBitsPerTable + b)
        var dot = 0.0
        var d = 0
        while (d < lim) {
          dot += vec.getDouble(d) * p(d)
          d += 1
        }
        if (dot > 0) code |= 1 << b
        b += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  /** Column-level entry point. */
  def apply(vec: Column, tables: Int, bits: Int): Column =
    ColumnBridge.column(
      HyperplaneCodes(ColumnBridge.expression(vec), tables, bits))
}
