package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** I3: custom Catalyst `Generator` — character n-grams with positions.
  *
  * The engine-capability proof that whole-operator extension works: a
  * lateral generator (UDTF) implemented directly against the Generator
  * contract, planned by Spark's own `GenerateExec` (so it composes with
  * any query shape, unlike a driver-side explode). One input row yields
  * `len(s) - n + 1` output rows `(pos, gram)`.
  *
  * Register per-session via
  * `spark.sessionState.functionRegistry.createOrReplaceTempFunction`
  * and invoke from SQL: `SELECT char_ngrams(col) FROM t`.
  * Unit-tested in `graft.CharNGramsSpec`.
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires a string input, got ${child.dataType}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // iterate CODEPOINTS, not UTF-16 code units: a surrogate pair is one
      // character, matching SQL substr semantics (round-4 review finding)
      val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
      if (cps.length < n) Nil
      else (0 to cps.length - n).map { i =>
        InternalRow(i, UTF8String.fromString(new String(cps, i, n)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)
}

object CharNGrams {
  /** Session-scoped SQL registration: `char_ngrams(str[, n])`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_ngrams",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => CharNGrams(s, 3)
        case Seq(s, org.apache.spark.sql.catalyst.expressions.Literal(v, IntegerType)) =>
          CharNGrams(s, v.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "char_ngrams(str[, n:int literal])")
      },
      "scala_udf")
}
