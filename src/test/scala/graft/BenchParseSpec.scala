package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the isolated-runner masquerade fix: a child that reports its
  * query in its own `failed` list must surface as a FAILURE, never as a
  * timing (round 13 recorded a broken d_cosine_auto child's 0.014 s
  * time-to-throw as if it were a measurement; the clean run was 2.2 s).
  * Pure-parse tests — no JVM forking needed to hold the contract.
  */
class BenchParseSpec extends AnyFunSuite {

  test("a deliberately-failing child is reported failed, not timed") {
    // exactly the shape Bench.main writes for a failed query: the wall
    // (time-to-throw) is still present in the queries map, and the name
    // is in `failed`
    val subset = """{"metric":"total","value":0.014,"unit":"sec","failed":["d_cosine_auto"],"queries":{"d_cosine_auto":0.014},"sf":"/root/testdata/sf0.1"}"""
    val out = Bench.parseIsolatedChild("d_cosine_auto", subset)
    assert(out.isLeft, s"failed child masqueraded as a timing: $out")
  }

  test("a clean child's timing is accepted") {
    val subset = """{"metric":"total","value":2.231,"unit":"sec","failed":[],"queries":{"d_cosine_auto":2.231},"sf":"/root/testdata/sf0.1"}"""
    assert(Bench.parseIsolatedChild("d_cosine_auto", subset) == Right(2.231))
  }

  test("a child artifact with no timing for the query is a failure") {
    val subset = """{"metric":"total","value":0.0,"unit":"sec","failed":[],"queries":{},"sf":"x"}"""
    assert(Bench.parseIsolatedChild("q_missing", subset).isLeft)
  }

  test("another failed query in the same child does not poison this one") {
    val subset = """{"metric":"total","value":3.0,"unit":"sec","failed":["other_q"],"queries":{"other_q":0.01,"good_q":2.99},"sf":"x"}"""
    assert(Bench.parseIsolatedChild("good_q", subset) == Right(2.99))
  }

  test("a same-named key outside the queries map is never mistaken for the timing") {
    val subset = """{"metric":"total","value":0.0,"unit":"sec","failed":[],"queries":{},"lake_plan":{"q_x":1.5},"sf":"x"}"""
    assert(Bench.parseIsolatedChild("q_x", subset).isLeft)
  }
}
