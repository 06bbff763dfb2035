package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** D8: typed UDAF — second-largest *distinct* value of a Long column.
  *
  * Buffer keeps the top-2 distinct values seen; merge is associative and
  * commutative, so Spark runs it as partial (map-side) + final aggregate —
  * the shuffle carries one 2-long buffer per (group × partition), which is
  * what makes a custom aggregate scale like a built-in.
  *
  * Output is `Long.MinValue` when the group has < 2 distinct values;
  * callers null it out with `when(...)`. Register via
  * `functions.udaf(SecondMax)`.
  */
object SecondMax extends Aggregator[Long, (Long, Long), Long] {
  val Unset: Long = Long.MinValue

  override def zero: (Long, Long) = (Unset, Unset)

  private def add(b: (Long, Long), v: Long): (Long, Long) = {
    val (m1, m2) = b
    if (v == m1 || v == m2) b
    else if (v > m1) (v, m1)
    else if (v > m2) (m1, v)
    else b
  }

  override def reduce(b: (Long, Long), v: Long): (Long, Long) = add(b, v)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = {
    // Unset sentinels must not enter as real values
    val x = if (b._1 == Unset) a else add(a, b._1)
    if (b._2 == Unset) x else add(x, b._2)
  }

  override def finish(b: (Long, Long)): Long = b._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
