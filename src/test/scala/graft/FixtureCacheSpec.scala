package graft

import graft.ops.FixtureCache

/** The [[graft.ops.FixtureCache]] build-once discipline itself —
  * independent of its consumers (ensurePairs / AnnIvf.ensureIndex,
  * whose row-level equivalence is pinned in `MaterializedPairsSpec` /
  * `AnnIvfSpec`): one build per content identity, crash debris
  * rebuilt, failed builds never committed, superseded caches evicted,
  * concurrent callers served from a single build. */
class FixtureCacheSpec extends SparkTestBase {

  /** A private fixture dir holding one dependency file. */
  private def mkFixture(): (String, java.io.File) = {
    val fx = java.nio.file.Files.createTempDirectory("graft_fc_fx_").toString
    val dep = new java.io.File(fx, "data.bin")
    java.nio.file.Files.write(dep.toPath, Array.fill[Byte](64)(7))
    (fx, dep)
  }

  private def conf = spark.sessionState.newHadoopConf()

  test("builds once per content identity; marker-committed dir is served after") {
    val (fx, _) = mkFixture()
    var builds = 0
    def ensure() = FixtureCache.ensure(spark, "spec_a", fx,
      Seq(s"$fx/data.bin")) { tmp =>
      builds += 1
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "payload"), "built")
    }
    val d1 = ensure()
    val d2 = ensure()
    assert(builds == 1, "second call must be served from the committed cache")
    assert(d1 == d2)
    assert(new java.io.File(d1, FixtureCache.Marker).exists)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d1, "payload")) == "built")
  }

  test("a failed build commits nothing; the next call rebuilds") {
    val (fx, _) = mkFixture()
    var attempts = 0
    def ensure(fail: Boolean) = FixtureCache.ensure(spark, "spec_b", fx,
      Seq(s"$fx/data.bin")) { tmp =>
      attempts += 1
      if (fail) throw new RuntimeException("boom")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    }
    intercept[RuntimeException] { ensure(fail = true) }
    val dir = FixtureCache.cacheDir(conf, "spec_b", fx, Seq(s"$fx/data.bin"))
    assert(!new java.io.File(dir, FixtureCache.Marker).exists,
      "failed build must not commit a marker")
    val d = ensure(fail = false)
    assert(attempts == 2 && new java.io.File(d, FixtureCache.Marker).exists)
  }

  test("crash debris (dir without marker) is rebuilt, not served") {
    val (fx, _) = mkFixture()
    val dir = FixtureCache.cacheDir(conf, "spec_c", fx, Seq(s"$fx/data.bin"))
    // simulate a pre-commit crash: the final dir exists, no marker
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "payload"), "stale-half-write")
    var builds = 0
    val d = FixtureCache.ensure(spark, "spec_c", fx, Seq(s"$fx/data.bin")) {
      tmp =>
        builds += 1
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(tmp, "payload"), "fresh")
    }
    assert(builds == 1)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(d, "payload")) == "fresh")
  }

  test("changed dependency content derives a new dir and evicts the old one") {
    val (fx, dep) = mkFixture()
    def ensure() = FixtureCache.ensure(spark, "spec_d", fx,
      Seq(s"$fx/data.bin")) { tmp =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    }
    val d1 = ensure()
    // regenerate the dependency: same path, different size + mtime
    java.nio.file.Files.write(dep.toPath, Array.fill[Byte](128)(9))
    assert(dep.setLastModified(dep.lastModified() + 5000))
    val d2 = ensure()
    assert(d2 != d1, "content key must change with the dependency bytes")
    assert(!new java.io.File(d1).exists, "superseded cache must be evicted")
    assert(new java.io.File(d2, FixtureCache.Marker).exists)
  }

  test("concurrent callers in one JVM share a single build") {
    val (fx, _) = mkFixture()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = (1 to 4).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String =
            FixtureCache.ensure(spark, "spec_e", fx, Seq(s"$fx/data.bin")) {
              tmp =>
                builds.incrementAndGet()
                java.nio.file.Files.createDirectories(
                  java.nio.file.Paths.get(tmp))
            }
        })
      }
      val dirs = tasks.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(dirs.distinct.size == 1)
      assert(builds.get == 1, "object lock must serialize to one build")
    } finally pool.shutdown()
  }

  test("TWO JVMs racing the same family commit exactly one dir; the " +
      "loser serves the winner's copy (r19 verdict #7)") {
    // fork-per-query bench made the cross-PROCESS race the COMMON
    // path: two children that both miss the marker build privately and
    // race the atomic staging rename. Real subprocesses (the actual
    // FixtureCache code via FixtureCacheRaceProbe), entry aligned by a
    // ready/go barrier so both are provably inside ensure() before
    // either commits; builds sleep 4s to hold the window open.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val (fx, _) = mkFixture()
    val cacheRoot = Files.createTempDirectory("graft_fc_race_root_").toString
    val sync = Files.createTempDirectory("graft_fc_race_sync_").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens"))
    def launch(id: String): (Process, String) = {
      val out = s"$sync/out_$id"
      val cmd = (Seq(javaBin, "-Xmx2g") ++ opens ++ Seq("-cp", cp,
        "graft.FixtureCacheRaceProbe", cacheRoot, sync, id,
        "spec_race", fx, "4000", out)).asJava
      val pb = new ProcessBuilder(cmd)
      pb.redirectErrorStream(true)
      pb.redirectOutput(new java.io.File(s"$sync/log_$id"))
      (pb.start(), out)
    }
    val (p1, out1) = launch("A")
    val (p2, out2) = launch("B")
    // barrier: release only once BOTH probes are sitting at the gate
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while ((!Files.exists(Paths.get(sync, "ready_A")) ||
        !Files.exists(Paths.get(sync, "ready_B"))) &&
        System.nanoTime() < deadline)
      Thread.sleep(20)
    assert(Files.exists(Paths.get(sync, "ready_A")) &&
      Files.exists(Paths.get(sync, "ready_B")),
      s"probes never reached the barrier — see $sync/log_A, $sync/log_B")
    Files.writeString(Paths.get(sync, "go"), "go")
    assert(p1.waitFor(180, java.util.concurrent.TimeUnit.SECONDS) &&
      p2.waitFor(10, java.util.concurrent.TimeUnit.SECONDS),
      "race probes did not finish")
    assert(p1.exitValue() == 0 && p2.exitValue() == 0,
      s"probe failed — see $sync/log_A, $sync/log_B")
    val Seq(r1, r2) = Seq(out1, out2).map { f =>
      val Array(dir, payload) = Files.readString(Paths.get(f)).split("\n")
      (dir, payload)
    }
    // both callers were served THE SAME committed dir…
    assert(r1._1 == r2._1, s"probes served different dirs: $r1 vs $r2")
    // …whose payload is exactly one probe's intact build (no mixture)
    assert(r1._2 == r2._2 && Set("A", "B").contains(r1._2))
    assert(Files.exists(Paths.get(r1._1, FixtureCache.Marker)))
    // exactly ONE committed dir for the family; the loser's staging
    // dir was deleted, never committed
    val fam = new java.io.File(cacheRoot).listFiles()
      .filter(_.getName.startsWith("graft_spec_race_"))
    assert(fam.length == 1,
      s"expected one committed dir, found ${fam.map(_.getName).toSeq}")
    assert(!fam.head.getName.contains(".tmp_"))
  }
}
