package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev profiling main (r21 optimization round): run named registered
  * queries exactly as [[Bench]] does (same session shape, same noop
  * sink) with a SparkListener attached, and print a per-execution
  * breakdown — jobs, stages, task counts, per-stage wall time and
  * shuffle bytes — so optimization work targets the measured cost, not
  * a guess (optimization guide §1).
  *
  * Usage: `runMain graft.Prof <sfDir> <reps> q1 [q2 ...]`
  */
object Prof {
  private class L extends SparkListener {
    case class St(name: String, tasks: Int, ms: Long, shufR: Long,
      shufW: Long, input: Long, out: Long)
    val stages = mutable.ArrayBuffer[St]()
    val jobMs = mutable.ArrayBuffer[Long]()
    private val jobStart = mutable.Map[Int, Long]()
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobStart(j.jobId) = j.time
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobStart.remove(j.jobId).foreach(t0 => jobMs += (j.time - t0))
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val m = i.taskMetrics
      stages += St(i.name.takeWhile(_ != '\n'), i.numTasks,
        i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
        m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
        m.inputMetrics.bytesRead, m.outputMetrics.bytesWritten)
    }
    def reset(): Unit = { stages.clear(); jobMs.clear(); jobStart.clear() }
    def report(): String = {
      val head = f"jobs=${jobMs.size} stages=${stages.size} " +
        f"tasks=${stages.map(_.tasks).sum} stageMs=${stages.map(_.ms).sum} " +
        f"jobMs=${jobMs.sum}"
      val rows = stages.map(s =>
        f"    ${s.ms}%6dms t=${s.tasks}%3d in=${s.input / 1024}%8dK " +
        f"sr=${s.shufR / 1024}%7dK sw=${s.shufW / 1024}%7dK  ${s.name}%.70s")
      (head +: rows).mkString("\n")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").filter(_.nonEmpty)
      .foreach(d => builder.config(ops.Util.CheckpointDirConf, d))
    // experiment hook: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" for A/B-ing
    // session confs before promoting one into Bench
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    for (tbl <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      try graft.ops.Util.t(spark, sfDir, tbl).write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      // warm-up rep (uncounted): FixtureCache builds, codegen JIT
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val times = (1 to reps).map { r =>
        Thread.sleep(50); l.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        if (r == reps) println(s"[prof] $n rep$r ${f"$sec%.3f"}s\n" + l.report())
        sec
      }
      println(f"[prof] $n reps=${times.map(t => f"$t%.3f").mkString(",")} " +
        f"min=${times.min}%.3f")
    }
    spark.stop()
  }
}
