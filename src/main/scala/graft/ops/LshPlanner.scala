package graft.ops

/** Derives MinHash-LSH banding parameters from a target Jaccard
  * threshold, the way the SRP side derives bits-per-band from corpus
  * size ([[Similarity]]): the knobs are computed from the contract the
  * operator has to honor, not hard-coded.
  *
  * Background (Leskovec/Rajaraman/Ullman ch.3, and the reference's
  * fixed-parameter fingerprinting it replaces): with `b` bands of `r`
  * min-hashes each, a pair with Jaccard similarity `s` becomes a
  * candidate with probability `1 − (1 − s^r)^b` — an S-curve whose
  * inflection sits near `(1/b)^(1/r)`. Planning = choosing `(b, r)`
  * under a hash budget so the curve's step lands on the requested
  * threshold with minimal mass on the wrong side.
  *
  * The error integrals are weighted asymmetrically (fn > fp) because
  * the two failure modes are not symmetric in a dedup pipeline: a
  * false NEGATIVE is a missed duplicate that stays in the training
  * corpus forever, while a false POSITIVE only costs one exact-Jaccard
  * evaluation in the verify stage ([[Dedup.jaccardPairs]]), which then
  * rejects it — bounded compute, no corpus damage.
  */
object LshPlanner {

  /** A banding choice: `bands` bands × `rows` min-hashes per band. */
  final case class LshPlan(bands: Int, rows: Int) {
    def numHashes: Int = bands * rows

    /** P(candidate | Jaccard = s) — the S-curve. */
    def candidateProb(s: Double): Double =
      1.0 - math.pow(1.0 - math.pow(s, rows.toDouble), bands.toDouble)

    /** The curve's approximate inflection point. */
    def threshold: Double = math.pow(1.0 / bands, 1.0 / rows)
  }

  private val GridPoints = 1000

  /** Weighted area on the wrong side of `threshold`: false-positive
    * mass below it plus false-negative mass above it, midpoint rule. */
  private[graft] def weightedError(
      p: LshPlan, threshold: Double,
      fpWeight: Double, fnWeight: Double): Double = {
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i < GridPoints) {
      val s = (i + 0.5) / GridPoints
      val prob = p.candidateProb(s)
      if (s < threshold) fp += prob else fn += 1.0 - prob
      i += 1
    }
    (fpWeight * fp + fnWeight * fn) / GridPoints
  }

  /** The `(bands, rows)` with `bands × rows ≤ maxHashes` minimizing the
    * weighted error around `threshold`. Ties break toward fewer hashes
    * (cheaper signatures), then more bands (higher recall). */
  def plan(
      threshold: Double, maxHashes: Int,
      fpWeight: Double = 0.4, fnWeight: Double = 0.6): LshPlan = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold=$threshold")
    require(maxHashes >= 1, s"maxHashes=$maxHashes")
    val candidates = for {
      r <- 1 to maxHashes
      b <- 1 to maxHashes / r
    } yield LshPlan(b, r)
    candidates.minBy(p =>
      (weightedError(p, threshold, fpWeight, fnWeight),
        p.numHashes, -p.bands))
  }
}
