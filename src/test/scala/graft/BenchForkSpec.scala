package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.parseChildArtifact]] — the fork-mode child-artifact
  * scraper whose r19-advice bugs (exit-code-as-pass-signal, mantissa-
  * only number capture, value_min=value) were fixed but never
  * spec-locked (r20 verdict #4: "one parsing regression and a future
  * BENCH_sf*_fork.json silently lies again"). Synthetic child lines
  * exercise each failure signature without launching JVMs. */
class BenchForkSpec extends AnyFunSuite {

  private def child(name: String, v: String, failed: String = "",
      valueMin: String = "", warmup: String = "12.5"): String = {
    val vm = if (valueMin.nonEmpty) s""","value_min":$valueMin""" else ""
    s"""{"metric":"total","unit":"sec","sf":"x","rep_outliers":{},""" +
      s""""queries":{"$name":$v},"failed":[$failed],"value":$v$vm,""" +
      s""""reps":3,"wall_sec":9.9} """ +
      s"""{"metric":"total_compact","unit":"sec","value":$v,""" +
      s""""warmup_sec":$warmup,"wall_sec":9.9}"""
  }

  test("healthy child: median, value_min and warmup all parsed") {
    val (sec, secMin, warm) = Bench.parseChildArtifact("q1",
      child("q1", "2.5", valueMin = "2.1"), exit = 0)
    assert(sec === Some(2.5))
    assert(secMin === Some(2.1))
    assert(warm === 12.5)
  }

  test("scientific-notation child value parses fully (4.9E-4, not 4.9)") {
    val (sec, secMin, _) = Bench.parseChildArtifact("q1",
      child("q1", "4.9E-4"), exit = 0)
    assert(sec === Some(4.9e-4))
    // no value_min in the artifact -> falls back to the median
    assert(secMin === Some(4.9e-4))
  }

  test("child-reported failure with exit 0 is a FAILURE (r19 advice high)") {
    val (sec, secMin, _) = Bench.parseChildArtifact("q1",
      child("q1", "-1.0", failed = "\"q1\""), exit = 0)
    assert(sec === None)
    assert(secMin === None)
  }

  test("negative value with empty failed array is still not a pass") {
    val (sec, _, _) = Bench.parseChildArtifact("q1",
      child("q1", "-1.0"), exit = 0)
    assert(sec === None)
  }

  test("nonzero exit fails the query even with a plausible value") {
    val (sec, _, _) = Bench.parseChildArtifact("q1",
      child("q1", "2.5", valueMin = "2.1"), exit = 137)
    assert(sec === None)
  }

  test("empty/unreadable child artifact fails, warmup defaults to 0") {
    val (sec, secMin, warm) = Bench.parseChildArtifact("q1", "", exit = 0)
    assert(sec === None)
    assert(secMin === None)
    assert(warm === 0.0)
  }

  test("query-name regex is quoted: a name with regex metachars parses") {
    val (sec, _, _) = Bench.parseChildArtifact("q+1",
      child("q+1", "1.25"), exit = 0)
    assert(sec === Some(1.25))
  }

  test("negative value_min is ignored, median stands in") {
    val (sec, secMin, _) = Bench.parseChildArtifact("q1",
      child("q1", "2.5", valueMin = "-3.0"), exit = 0)
    assert(sec === Some(2.5))
    assert(secMin === Some(2.5))
  }
}
