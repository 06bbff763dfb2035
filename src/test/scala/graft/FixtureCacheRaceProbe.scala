package graft

import java.nio.file.{Files, Paths}

/** Subprocess half of the FixtureCacheSpec two-JVM race pin (r19
  * verdict #7: fork-per-query bench made the cross-PROCESS race the
  * COMMON path, so it needs a pin of its own — the in-JVM object lock
  * covers threads only).
  *
  * args: cacheRoot syncDir probeId name anchorFile buildSleepMs outFile
  *
  * Protocol: write `ready_<probeId>` into syncDir, wait for the test
  * to drop `go`, then call the REAL `FixtureCache.ensure` with a build
  * that sleeps (holding the race window open) and stamps its probeId
  * as the payload. The served dir and its payload land in outFile. */
object FixtureCacheRaceProbe {
  def main(args: Array[String]): Unit = {
    val Array(cacheRoot, syncDir, probeId, name, anchor, sleepMs, outFile) =
      args
    System.setProperty("graft.cache.root", cacheRoot)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      Files.writeString(Paths.get(syncDir, s"ready_$probeId"), probeId)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!Files.exists(Paths.get(syncDir, "go")) &&
          System.nanoTime() < deadline)
        Thread.sleep(10)
      val dir = graft.ops.FixtureCache.ensure(spark, name, anchor,
        Seq(anchor)) { staging =>
        Files.createDirectories(Paths.get(staging))
        Thread.sleep(sleepMs.toLong)
        Files.writeString(Paths.get(staging, "payload"), probeId)
        ()
      }
      val payload = Files.readString(Paths.get(dir, "payload"))
      Files.writeString(Paths.get(outFile), s"$dir\n$payload")
    } finally spark.stop()
  }
}
