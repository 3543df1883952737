package graft.format

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the footer KMV ndv synopsis (format v004):
  *
  *  - MERGE CORRECTNESS: for ANY partitioning of a value set into file
  *    sketches, merging the per-part k-min sketches equals the k smallest
  *    distinct hashes of the whole set — the invariant that makes
  *    footer-sketch aggregation valid at any file layout (and after any
  *    compaction that re-applies the option);
  *  - estimator sanity: exact below k, within KMV error above it;
  *  - the portable hash folds exactly the first 15 md5 hex nibbles.
  */
object KmvProperties extends Properties("graft.format.kmv") {

  private val genValues: Gen[List[Long]] =
    Gen.chooseNum(1, 900).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)))

  private val genK: Gen[Int] = Gen.oneOf(16, 64, 256)

  private def kmin(hashes: Iterable[Long], k: Int): Array[Long] =
    hashes.toSet.toArray.sorted.take(k)

  property("merge of any partitioning equals the global k-min") =
    Prop.forAllNoShrink(genValues, genK, Gen.chooseNum(1, 7)) { (vs, k, parts) =>
      val hashes = vs.map(KmvUtil.hashLong)
      val global = kmin(hashes, k)
      // deterministic partition assignment driven by the value itself
      val sketches = hashes.groupBy(h => math.floorMod(h, parts.toLong))
        .values.map(kmin(_, k)).toSeq
      KmvUtil.merge(sketches, k).sameElements(global)
    }

  property("estimator: exact below k, bounded error above") =
    // forAllNoShrink: ScalaCheck's default Int shrinker would walk k
    // OUTSIDE genK's {16,64,256} domain (a k=16 failure once re-reported
    // as k=2), making counterexamples unreproducible nonsense
    Prop.forAllNoShrink(genValues, genK) { (vs, k) =>
      val hashes = vs.map(KmvUtil.hashLong).toSet
      val sketch = kmin(hashes, k)
      val est = KmvUtil.estimate(sketch, k)
      if (hashes.size < k) est == hashes.size.toDouble
      else if (hashes.size < 2 * k) {
        // boundary zone n in [k, 2k): the estimate rides the kth order
        // statistic at the EDGE of the sample, where its variance is far
        // above the asymptotic 1/sqrt(k) (a full-suite seed falsified the
        // tight bound at n == k == 16 with rel ~0.8 — correct estimator,
        // over-claiming property). Only sanity is claimable here.
        est > 0.0 && math.abs(est - hashes.size) / hashes.size < 2.0
      } else {
        // classic KMV concentration (n >= 2k) at 5 sigma: ~100 samples per
        // run, every CI run a fresh seed — 3 sigma falsified legitimately
        // every ~50 runs at k=16 (P(|err| > 3/sqrt(k)) ~ 0.3% per sample).
        // Systematically broken estimator math (wrong constant, off-by-one
        // k) still lands far outside 5/sqrt(256) ~ 0.31 on the k=256 cases.
        val rel = math.abs(est - hashes.size) / hashes.size
        rel < 5.0 / math.sqrt(k.toDouble) + 0.05
      }
    }

  property("portable hash = first 15 md5 hex nibbles, big-endian") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { v =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(java.lang.Long.toString(v).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val expect = hex.take(15).foldLeft(0L)((a, c) =>
        a * 16 + Character.digit(c, 16))
      KmvUtil.hashLong(v) == expect
    }
}
