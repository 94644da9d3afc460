package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench.{KgRunResult, Sample, qualifyStep}

/** The bench's self-qualification decision (VERDICT r3 "What's wrong"
  * #1), driven through every branch with synthetic samples: clean gate
  * pass, contended-level retry, capacity-bound exhaustion, and the
  * genuine-scaling-limit marker that must never be explained away. */
class BenchSpec extends AnyFunSuite {

  private val Triples = 1000000L
  private def s(level: Int, tag: String, wall: Double,
                cpuSec: Double): Sample =
    Sample(level, tag, KgRunResult(wall, Triples,
      busy = level.toDouble, cpu = cpuSec / wall))

  private val noRetries = Map(1 -> 0, 4 -> 0)

  test("efficiency at or above the gate qualifies clean") {
    // n1 400s, n4 110s → eff = (400/110)/4 = 0.909
    val samples = Seq(s(1, "a", 400, 380), s(4, "b", 110, 400))
    assert(qualifyStep(samples, 1, 4, noRetries) == Right("clean"))
  }

  test("below the gate with an inflated big level requests a retry") {
    // eff = (400/160)/4 = 0.625; n4 burned 560 cpu-sec vs 380 cleanest
    // (1.47x > 1.2) → retry level 4
    val samples = Seq(s(1, "a", 400, 380), s(4, "b", 160, 560))
    assert(qualifyStep(samples, 1, 4, noRetries) == Left(4))
    // a clean retry sample flips the verdict to clean
    val after = samples :+ s(4, "retryB1", 110, 400)
    assert(qualifyStep(after, 1, 4, Map(1 -> 0, 4 -> 1)) == Right("clean"))
  }

  test("an inflated SMALL level is retried too") {
    // the small level's best sample is itself contended: n1 600s with
    // 550 cpu-sec vs n4's 100s/390 — eff = (600/100)/4 = 1.5 ≥ gate…
    // make it below-gate via a slow n4 pair instead:
    // n1 600s/550cpu (inflated vs 390 cleanest), n4 200s/390cpu →
    // eff = (600/200)/4 = 0.75 < 0.8; big not inflated, small is
    val samples = Seq(s(1, "a", 600, 550), s(4, "b", 200, 390))
    assert(qualifyStep(samples, 1, 4, noRetries) == Left(1))
  }

  test("retry budget exhausted with the signature → capacity-bound") {
    val samples = Seq(s(1, "a", 400, 380), s(4, "b", 160, 560))
    val res = qualifyStep(samples, 1, 4, Map(1 -> 0, 4 -> 2))
    assert(res.isRight)
    assert(res.toOption.get.startsWith("capacity-bound:"),
      res.toOption.get)
    assert(res.toOption.get.contains("560"), "cites the cpu-sec evidence")
  }

  test("below the gate with BALANCED cpu-seconds is genuine, not noise") {
    // eff = (400/160)/4 = 0.625 but both levels burned ~the same
    // cpu-seconds → a real serialization point; must NOT retry
    val samples = Seq(s(1, "a", 400, 380), s(4, "b", 160, 400))
    val res = qualifyStep(samples, 1, 4, noRetries)
    assert(res == Right("genuine: cpu-seconds balanced across levels"))
  }

  test("min-of-k picks the cleanest sample of each level") {
    // the first n4 sample is polluted; the later clean one must decide
    val samples = Seq(
      s(1, "mSa", 410, 368), s(4, "mBa", 123, 443),
      s(1, "mSb", 272, 249), s(4, "mBb", 84, 289), s(4, "mBc", 89, 307))
    // eff from chosen (272, 84) = (272/84)/4 = 0.81 → clean
    assert(qualifyStep(samples, 1, 4, noRetries) == Right("clean"))
  }
}
