package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared helpers for the query library.
  *
  * Determinism contract (SURVEY.md §2.2, tightened after round-1 verdict):
  * every oracle-checked query
  *  - ends in a fully tie-broken ORDER BY,
  *  - never aggregates raw DOUBLE — inputs are cast to DECIMAL(18,4),
  *    summed exactly, and the *final* value is fixed to DECIMAL(38,6) and
  *    then cast to DOUBLE. Exact decimal arithmetic agrees bit-for-bit
  *    between Spark and DuckDB, and the final DECIMAL(38,6)→DOUBLE
  *    conversion is correctly rounded in both engines (unscaled values at
  *    the gate's scale stay < 2^53), so the doubles are bit-identical.
  *    DOUBLE/BIGINT/STRING finals also avoid engine-specific decimal
  *    rendering in the driver's hasher (round-1 `hash_match:false` on
  *    value-identical DECIMAL output),
  *  - uses explicit NULLS FIRST/LAST on every nullable sort key (Spark and
  *    DuckDB have opposite defaults).
  */
object Util {
  /** Read one fixture table. Parquet scan → Catalyst handles column
    * pruning + predicate pushdown; at cluster scale this is the same call
    * against a partitioned table root.
    *
    * The events table carries a parquet TIMESTAMP(NANOS) column, which
    * Spark rejects outright unless read as a nano-count Long
    * (`spark.sql.legacy.parquet.nanosAsLong`); we floor-divide to
    * microseconds — exactly DuckDB's TIMESTAMP_NS→TIMESTAMP(µs)
    * conversion, which FLOORS. Plain `DIV` truncates toward zero and
    * would differ by 1µs on pre-epoch nanos (round-4 advice), so the
    * division goes through pmod: `ts - pmod(ts, 1000)` is the largest
    * multiple of 1000 ≤ ts for any sign, making the DIV exact.
    *
    * A regenerated fixture instead writes naive micros (parquet
    * `isAdjustedToUTC = false`), which Spark 4 infers as TIMESTAMP_NTZ
    * — a type the timestamp surface (`unix_micros`, windows, as-of
    * bounds) rejects. The fixture's event time IS UTC instants (the
    * DuckDB oracle reads the same naive micros as its UTC-epoch
    * TIMESTAMP), so reinterpret NTZ wall-clock as session-TZ instants;
    * every session pins UTC, leaving the stored micros unchanged and
    * both engines bit-agreed. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeFixture(spark.read.parquet(s"$sfDir/$name.parquet"),
      name == "events")
  }

  /** The fixture-timestamp normalization of [[t]], factored so a
    * STREAMING read of the same parquet (the J-family
    * batch-equivalence rungs) applies the identical physical-type
    * absorption — nanos-as-long floor-division and NTZ→session-TZ
    * cast must never diverge between the batch and stream paths. */
  def normalizeFixture(df0: DataFrame, eventsTs: Boolean): DataFrame = {
    val df =
      if (eventsTs && df0.schema.fieldNames.contains("ts")
          && df0.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df0.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) DIV 1000")))
      else df0
    df.schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      .foldLeft(df)((d, f) =>
        d.withColumn(f.name, col(f.name).cast("timestamp")))
  }

  /** DECIMAL(18,4)-cast an input column before aggregation (contract rule 2). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Finalize a computed decimal: fix to DECIMAL(38,6), then DOUBLE. */
  def dbl(c: Column): Column = c.cast(DecimalType(38, 6)).cast(DoubleType)

  /** Exact decimal sum of a (castable) numeric column, finalized to DOUBLE. */
  def decSumDbl(c: Column): Column = dbl(sum(dec(c)))

  /** Exact average with COUNT(*) divisor (matches the D1 oracle exactly:
    * SUM(decimal)/COUNT(*), one final rounding point, then DOUBLE).
    * NOTE: divisor counts all rows, not non-null values — only use on
    * non-null columns or where COUNT(*) semantics are intended. */
  def avgAllDbl(c: Column): Column = dbl(sum(dec(c)) / count(lit(1)))

  /** Money-as-integer-cents: deterministic BIGINT from a 2-decimal DOUBLE.
    * round() is HALF_UP for positive values in both Spark and DuckDB. */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Conf key for the reliable-checkpoint switch: when set to a
    * directory (HDFS/S3/local path), iterative ops checkpoint THROUGH
    * the filesystem instead of executor block storage. */
  val CheckpointDirConf = "spark.graft.checkpoint.dir"

  /** Lineage checkpoint for iterative dataflows (pagerank / HITS /
    * label-prop / k-core / BFS / connected components), conf-gated
    * (round-16 verdict #5):
    *
    *  - default: `localCheckpoint(eager)` — materialized blocks live
    *    on executors. Fast (no fs round-trip), right for local mode
    *    and for clusters where a lost executor may simply re-run the
    *    job.
    *  - with [[CheckpointDirConf]] set: RELIABLE `checkpoint(eager)`
    *    into that directory. On a real cluster an executor loss
    *    mid-iteration otherwise kills the truncated lineage
    *    IRRECOVERABLY (the blocks' only copy died with the executor
    *    and the pre-checkpoint lineage was discarded) — the fs copy
    *    makes iteration state survive any executor loss, the 100-TB
    *    posture for multi-hour iterative jobs.
    *
    * Both variants go through the same Dataset.checkpoint machinery
    * and preserve physical partitioning in the resulting LogicalRDD,
    * so the partition-once join discipline is unaffected by the
    * switch (pinned in `GraphsSpec`). */
  implicit class IterCheckpoint(private val df: DataFrame) {
    def iterCheckpoint(eager: Boolean = true): DataFrame =
      df.sparkSession.conf.getOption(CheckpointDirConf)
        .filter(_.nonEmpty) match {
        case Some(dir) =>
          val sc = df.sparkSession.sparkContext
          // setCheckpointDir appends a per-app UUID subdir; only (re)set
          // when unset or pointed elsewhere (conf changed mid-session)
          if (!sc.getCheckpointDir.exists(_.contains(dir)))
            sc.setCheckpointDir(dir)
          df.checkpoint(eager)
        case None => df.localCheckpoint(eager)
      }
  }
}
