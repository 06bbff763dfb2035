package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash (Rabin-Karp family) of a string column —
  * document fingerprinting for the LLM-data pipeline: acc starts at 7
  * and folds each Unicode codepoint as `acc = (acc*31 + cp) mod 2^31-1`.
  *
  * This is the engine's native-codegen capability proof: unlike the
  * CodegenFallback [[CharNGrams]] generator, this expression implements
  * `doGenCode`, so it fuses into whole-stage codegen with zero
  * per-row boxing — the preferred shape for a scalar extension
  * (SURVEY.md §7.3: native Expression > UDF).
  *
  * The fold is plain modular arithmetic over codepoints, so the DuckDB
  * oracle replicates it exactly with `list_reduce` over
  * `ascii(substr(...))` — see OracleSql `text_rolling_hash`.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.String ${ev.value}_s = $c.toString();
         |long ${ev.value}_acc = 7L;
         |int ${ev.value}_i = 0;
         |while (${ev.value}_i < ${ev.value}_s.length()) {
         |  int ${ev.value}_cp = ${ev.value}_s.codePointAt(${ev.value}_i);
         |  ${ev.value}_acc = (${ev.value}_acc * 31L + ${ev.value}_cp) % 2147483647L;
         |  ${ev.value}_i += java.lang.Character.charCount(${ev.value}_cp);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Reference implementation (used by interpreted eval and tests). */
  def hash(s: String): Long = {
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  /** Session-scoped SQL registration: `rolling_hash(str)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s) => RollingHash(s)
        case _ => throw new IllegalArgumentException(
          "rolling_hash(str) takes exactly one argument")
      },
      "scala_udf")
}
