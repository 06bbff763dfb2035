package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop —
    // dump just the queries under iteration; tools/check.py takes the
    // same subset as trailing args)
    val rawOnly = args.drop(2).headOption
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // blank filter arg = no filter, never "none"
    // "__streaming__" in the filter = dev loop for the streaming
    // battery alone: no query dumps, no pins, just streaming.json
    val streamingOnly = rawOnly.exists(_.contains("__streaming__"))
    val only = rawOnly.map(_ - "__streaming__").filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case _ if streamingOnly && only.isEmpty => false
        case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // streaming-only dev loop: no dumps were written, so no oracle
    // manifest either (check.py would otherwise fail every query as
    // missing); a stale manifest from an earlier full run is removed
    if (streamingOnly && only.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/oracle_sql.json"))
    else {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    }
    // PINNED metrics for the rows-only queries (round-18 verdict #8):
    // the no-oracle entries' binding contracts — recall floors, sketch
    // error bounds, ground-truth parity — re-derived against this
    // fixture and emitted machine-checkably next to the dumps, so the
    // correctness artifact carries the pinned check, not just a row
    // count. SPARK_GRAFT_SKIP_PINNED=1 skips (subset dev loops).
    val skipPinned = streamingOnly ||
      sys.env.get("SPARK_GRAFT_SKIP_PINNED").exists(_ != "0")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val wanted = only.fold(rowsOnly)(rowsOnly.intersect)
    // stale-artifact guard (r19 advice): when pins DON'T run, any
    // pinned.json left in outDir is from an earlier fixture/build — a
    // subset re-run must not let check.py gate on it.
    if (skipPinned || wanted.isEmpty)
      Files.deleteIfExists(Paths.get(s"$outDir/pinned.json"))
    if (!skipPinned && wanted.nonEmpty) {
      // wanted is passed INTO Pinned.all so only the requested
      // queries' pin thunks execute (the subset fast path).
      val pins = ops.Pinned.all(spark, sfDir, Some(wanted))
        .filter(p => wanted.contains(p.query))
      val pj = pins.groupBy(_.query).toSeq.sortBy(_._1).map {
        case (name, ps) =>
          s"${q(name)}: [" + ps.map(p =>
            s"""{"metric":${q(p.metric)},"value":${p.value},""" +
              s""""bound":${p.bound},"op":${q(p.op)},"pass":${p.pass}}""")
            .mkString(",") + "]"
      }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/pinned.json"), pj)
      val nFail = pins.count(!_.pass)
      System.err.println(
        s"[verify] pinned: ${pins.size} checks, $nFail fail")
    }
    // STREAMING batch-equivalence records (round-19 verdict #4): the
    // 22 streaming/source-capability components of SURVEY §2.2 whose
    // proofs lived only inside `sbt test` — re-run Verify-side via
    // graft.ops.StreamingPinned and emitted as streaming.json so the
    // driver artifact lists them machine-checkably. Full runs only
    // (a subset dev loop shouldn't pay the ~2-min battery); the
    // stale-artifact guard mirrors pinned.json's.
    val skipStreaming =
      sys.env.get("SPARK_GRAFT_SKIP_STREAMING").exists(_ != "0")
    if (skipStreaming || (only.nonEmpty && !streamingOnly))
      Files.deleteIfExists(Paths.get(s"$outDir/streaming.json"))
    else {
      val scs = ops.StreamingPinned.all(spark, sfDir)
      val sj = scs.map { c =>
        val id = c.component.split(' ').head
        s"${q(id)}: {" +
          s""""component":${q(c.component)},"impl":${q(c.impl)},""" +
          s""""twin":${q(c.twin)},"rows_compared":${c.rows},""" +
          s""""match":${c.matches},"note":${q(c.note)}}"""
      }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/streaming.json"), sj)
      val nFail = scs.count(!_.matches)
      System.err.println(
        s"[verify] streaming: ${scs.size} checks, $nFail fail")
    }
    spark.stop()
  }
}
