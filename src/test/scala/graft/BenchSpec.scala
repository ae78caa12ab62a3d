package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-logic tests for [[Bench]] — no Spark session needed: the
  * contended-vs-regressed gate is pure bookkeeping and must behave
  * identically in a 30-second unit test and a 40-minute driver run.
  */
class BenchSpec extends AnyFunSuite {

  test("partitionFlags: contended flags self-identify, quiet flags stay regressed") {
    val spinStart = 50.0
    val spins = Map(
      "q_noise_a" -> 160.0, // 3.2× start spin — machine load, not a regression
      "q_noise_b" -> 80.0,  // 1.6× — still past the 1.5× gate
      "q_real" -> 55.0,     // quiet: a real regression must survive
      "q_border" -> 75.0)   // exactly 1.5× — NOT strictly greater, stays regressed
    val (regressed, contended) = Bench.partitionFlags(
      Seq("q_real", "q_noise_a", "q_border", "q_noise_b"),
      spins.get, spinStart)
    assert(regressed === Seq("q_border", "q_real"))
    assert(contended === Seq("q_noise_a", "q_noise_b"))
  }

  test("partitionFlags: fully-contended run empties regressed; missing sample is conservative") {
    // simulated-contention shape: every sample >= 3× start spin
    val (r1, c1) = Bench.partitionFlags(
      Seq("a", "b", "c"), (_: String) => Some(200.0), 50.0)
    assert(r1.isEmpty && c1 === Seq("a", "b", "c"))
    // a flag with no recorded spin sample must NOT be excused
    val (r2, c2) = Bench.partitionFlags(
      Seq("q_unsampled"), (_: String) => None, 50.0)
    assert(r2 === Seq("q_unsampled") && c2.isEmpty)
  }
}
