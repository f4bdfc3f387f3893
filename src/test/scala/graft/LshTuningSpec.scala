package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Dedup.{lshBanding, lshCandidateProb}

/** Pure-math properties of the LSH banding auto-tuner (no Spark jobs):
  * the chosen (bands, rowsPerBand) must spend the whole hash budget,
  * sit at the S-curve inflection closest to the requested threshold,
  * and bracket the threshold — similarities above it are strictly more
  * likely to become candidates than the same margin below it.
  */
object LshTuningSpec extends Properties("lshBanding") {

  private val genThreshold: Gen[Double] = Gen.chooseNum(0.1, 0.9)
  private val genBudget: Gen[Int] = Gen.oneOf(16, 32, 64, 128, 256)

  property("spends the budget exactly") =
    forAll(genThreshold, genBudget) { (t, n) =>
      val (b, r) = lshBanding(t, n)
      b * r == n && b >= 1 && r >= 1
    }

  property("inflection is the closest achievable to the threshold") =
    forAll(genThreshold, genBudget) { (t, n) =>
      val (b, r) = lshBanding(t, n)
      val chosen = math.abs(math.pow(1.0 / b, 1.0 / r) - t)
      (1 to n).filter(n % _ == 0).forall { rr =>
        chosen <= math.abs(math.pow(rr.toDouble / n, 1.0 / rr) - t) + 1e-12
      }
    }

  property("brackets the threshold: S-curve rises through it") =
    forAll(genThreshold, genBudget) { (t, n) =>
      val (b, r) = lshBanding(t, n)
      val lo = lshCandidateProb(b, r, math.max(t - 0.15, 0.01))
      val mid = lshCandidateProb(b, r, t)
      val hi = lshCandidateProb(b, r, math.min(t + 0.15, 0.99))
      lo < mid && mid < hi
    }

  property("ties break toward more bands (recall over precision)") =
    forAll(genThreshold, genBudget) { (t, n) =>
      val (b, r) = lshBanding(t, n)
      // any pair with the SAME inflection distance must not have more
      // bands than the chosen one
      (1 to n).filter(n % _ == 0).forall { rr =>
        val bb = n / rr
        val d = math.abs(math.pow(1.0 / bb, 1.0 / rr) - t)
        val chosen = math.abs(math.pow(1.0 / b, 1.0 / r) - t)
        math.abs(d - chosen) > 1e-12 || bb <= b
      }
    }

  // the round-7 measured scale path's hand-picked parameters are the
  // tuner's own choice — q26/q70's recall is unchanged by construction
  property("t=0.5, 32 hashes resolves to the round-7 (8,4)") =
    org.scalacheck.Prop(lshBanding(0.5, 32) == (8, 4))

  property("t=0.5, 64 hashes finds the exact inflection (16,4)") =
    org.scalacheck.Prop(lshBanding(0.5, 64) == (16, 4))
}
