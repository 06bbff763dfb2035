package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tooling (r21 optimization round): dump `explain("formatted")`
  * for named registered queries to files — the plan evidence the
  * optimization deliverable commits under `plans/r21/`.
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <suffix> q1 [q2 ...]`
  * writes `<outDir>/<query><suffix>.txt` per query. Uses the same
  * session shape as [[Bench]] so the dumped plan is the benched plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      val w = new java.io.PrintWriter(
        new java.io.File(s"$outDir/$n$suffix.txt"), "UTF-8")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote $outDir/$n$suffix.txt")
    }
    spark.stop()
  }
}
