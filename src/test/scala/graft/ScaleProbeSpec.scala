package graft

import org.scalatest.funsuite.AnyFunSuite

/** The derivation tool's substitution is load-bearing for every claim
  * SCALE_PROBE.md makes about "replicate, not stack": if a copy's map
  * were not a bijection, within-copy token/shingle/score structure would
  * NOT equal copy 0's and the ×N corpora would measure a different
  * workload. Pin the properties the rationale relies on (pure function —
  * no SparkSession needed). */
class ScaleProbeSpec extends AnyFunSuite {

  private def map(i: Int): Map[Char, Char] = {
    val (from, to) = ScaleProbe.subAlphabet(i)
    from.zip(to).toMap
  }

  test("copy 0 is the identity") {
    assert(map(0).forall { case (k, v) => k == v })
  }

  test("every copy's map is a class-preserving bijection") {
    (0 until 100).foreach { i =>
      val m = map(i)
      assert(m.size == 62, s"copy $i: map must cover all 62 symbols")
      assert(m.values.toSet.size == 62, s"copy $i: not injective")
      // Class preservation: lowercase→lowercase, upper→upper,
      // digit→digit — so tokenization (space/punct separators), case
      // grammars, and numeric parses behave identically in every copy.
      m.foreach { case (k, v) =>
        assert(k.isLower == v.isLower && k.isUpper == v.isUpper &&
          k.isDigit == v.isDigit, s"copy $i: $k -> $v crosses class")
      }
    }
  }

  test("copies differ from copy 0 (disjoint-vocabulary premise)") {
    // Not all 62 symbols can move for every copy (affine fixed points
    // exist), but each copy 1..99 must move MOST letters or the
    // cross-copy vocabularies would overlap substantially.
    (1 until 100).foreach { i =>
      val moved = map(i).count { case (k, v) => k != v }
      assert(moved >= 48, s"copy $i moved only $moved/62 symbols")
    }
  }

  test("lowercase maps are pairwise distinct across 100 copies") {
    // Disjoint-vocabulary premise between ANY two copies, not just
    // vs copy 0: (multiplier, offset) = (i mod 12, i mod 26) repeats
    // with period lcm(12, 26) = 156 > 100.
    val images = (0 until 100).map(i => ScaleProbe.subAlphabet(i)._2.take(26))
    assert(images.distinct.size == 100)
  }

  test("affine scramble is non-monotone whenever the multiplier is not 1") {
    // The aHash-order premise: a >= 3 jumps the alphabet
    // non-monotonically. Copies at i % 12 == 0 reuse a = 1 (a pure
    // rotation) — for THOSE, pairwise payload decorrelation is owned by
    // the per-copy cyclic WORD rotation in the documents tweak, which is
    // why both mechanisms exist (and why substitution alone measured
    // hamming 0).
    (1 until 100).filter(_ % 12 != 0).foreach { i =>
      val lo = ScaleProbe.subAlphabet(i)._2.take(26)
      val diffs = lo.zip(lo.tail).map { case (a, b) => b - a }.toSet
      // A rotation's signature is unit steps: {1} or {1, 1-26}.
      assert(diffs != Set(1) && diffs != Set(1, 1 - 26),
        s"copy $i lowercase image is a unit rotation: $lo")
    }
  }
}
