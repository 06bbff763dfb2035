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
}
