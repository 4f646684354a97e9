package graft

import graft.ops.LshPlanner
import graft.ops.LshPlanner.LshPlan
import org.scalatest.funsuite.AnyFunSuite

class LshPlannerSpec extends AnyFunSuite {

  test("production parameters derive from the 0.5 threshold") {
    // pins what q35/q37/q46/q52/q64 run with: changing the planner (or
    // the weights) in a way that moves the banding must show up here
    // before it silently changes five oracle queries
    assert(LshPlanner.plan(0.5, maxHashes = 8) == LshPlan(4, 2))
  }

  test("planner result minimizes the weighted error over the budget") {
    for (t <- Seq(0.3, 0.5, 0.7, 0.85); h <- Seq(8, 16)) {
      val chosen = LshPlanner.plan(t, h)
      val all = for { r <- 1 to h; b <- 1 to h / r } yield LshPlan(b, r)
      val best = all.map(p => LshPlanner.weightedError(p, t, 0.4, 0.6)).min
      assert(LshPlanner.weightedError(chosen, t, 0.4, 0.6) <= best + 1e-12,
        s"t=$t h=$h chose $chosen")
    }
  }

  test("candidate probability is an increasing S-curve through the threshold") {
    val p = LshPlanner.plan(0.5, 16)
    val probs = (0 to 100).map(i => p.candidateProb(i / 100.0))
    assert(probs.zip(probs.tail).forall { case (a, b) => b >= a })
    assert(p.candidateProb(0.0) == 0.0 && p.candidateProb(1.0) == 1.0)
    // the curve's step straddles the planned threshold: clearly below
    // 1/2 well under it, clearly above 1/2 well over it
    assert(p.candidateProb(p.threshold * 0.5) < 0.5)
    assert(p.candidateProb(math.min(1.0, p.threshold * 1.5)) > 0.5)
  }

  test("higher thresholds buy more rows per band (steeper, later curves)") {
    val loose = LshPlanner.plan(0.3, 16)
    val strict = LshPlanner.plan(0.9, 16)
    assert(strict.rows > loose.rows)
    assert(strict.threshold > loose.threshold)
  }

  test("false-negative weighting shifts the curve left of the neutral plan") {
    // fn-heavy weights must never plan a HIGHER inflection than the
    // neutral weighting at the same budget: catching dups is worth
    // extra verify work, the reverse is not
    for (t <- Seq(0.4, 0.5, 0.6)) {
      val fnHeavy = LshPlanner.plan(t, 8, fpWeight = 0.2, fnWeight = 0.8)
      val neutral = LshPlanner.plan(t, 8, fpWeight = 0.5, fnWeight = 0.5)
      assert(fnHeavy.threshold <= neutral.threshold + 1e-12)
    }
  }
}
