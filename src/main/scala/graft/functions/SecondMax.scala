package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** D8: typed UDAF — second-largest *distinct* value of a Long column.
  *
  * Buffer keeps the top-2 distinct values seen plus a distinct-count
  * saturated at 2, so "fewer than 2 distinct values" is tracked
  * explicitly rather than inferred from a sentinel (round-3 advice: a
  * genuine `Long.MinValue` input must not collide with the Unset
  * sentinel — inputs of exactly `Long.MinValue` are rejected, the one
  * documented domain restriction).
  *
  * merge is associative and commutative, so Spark runs it as partial
  * (map-side) + final aggregate — the shuffle carries one small buffer
  * per (group × partition), which is what makes a custom aggregate scale
  * like a built-in.
  *
  * Output is `Unset` when the group has < 2 distinct values; callers
  * null it out with `when(...)`. Register via `functions.udaf(SecondMax)`.
  */
object SecondMax extends Aggregator[Long, (Long, Long, Long), Long] {
  val Unset: Long = Long.MinValue

  /** (top distinct, second distinct, distinct-count capped at 2). */
  override def zero: (Long, Long, Long) = (Unset, Unset, 0L)

  private def add(b: (Long, Long, Long), v: Long): (Long, Long, Long) = {
    require(v != Long.MinValue,
      "SecondMax domain excludes Long.MinValue (reserved sentinel)")
    val (m1, m2, n) = b
    if (n == 0L) (v, Unset, 1L)
    else if (v == m1 || (n >= 2L && v == m2)) b
    else if (v > m1) (v, m1, 2L)
    else if (n < 2L || v > m2) (m1, v, 2L)
    else b
  }

  override def reduce(b: (Long, Long, Long), v: Long): (Long, Long, Long) = add(b, v)

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) = {
    val x = if (b._3 >= 1L) add(a, b._1) else a
    if (b._3 >= 2L) add(x, b._2) else x
  }

  override def finish(b: (Long, Long, Long)): Long =
    if (b._3 >= 2L) b._2 else Unset

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
