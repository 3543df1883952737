package graft.spark

import org.apache.hadoop.fs.{FileStatus, Path}
import org.scalatest.funsuite.AnyFunSuite

/** Pure logic of the twin-wins listing dedup (GraftUtil.shadowedOriginals /
  * dedupTwins): which file a published CoW rewrite output shadows, and —
  * just as important — which names it must NEVER touch (writer part files,
  * foreign suffixes, cross-directory coincidences, truncated hashes).
  */
class TwinDedupSpec extends AnyFunSuite {
  private def st(p: String): FileStatus =
    new FileStatus(1L, false, 1, 1L, 0L, new Path(p))
  private def shadowed(names: String*): Set[String] =
    GraftUtil.shadowedOriginals(names.map(st)).map(_.toUri.getPath)

  test("a published twin shadows its sibling original, and only then") {
    assert(shadowed("/t/X.graft", "/t/X-del12345678.graft") == Set("/t/X.graft"))
    // no original on disk: the twin is just a normal (converged) data file
    assert(shadowed("/t/X-del12345678.graft").isEmpty)
    // original without a twin: nothing to hide
    assert(shadowed("/t/X.graft", "/t/Y.graft").isEmpty)
    // all four rewrite tags shadow
    for (tag <- Seq("del", "upd", "mrg", "anz"))
      assert(shadowed("/t/X.graft", s"/t/X-${tag}abcdef01.graft") ==
        Set("/t/X.graft"), tag)
  }

  test("chained markers shadow the nearest LIVE ancestor") {
    // crash of rewrite 2: its output shadows rewrite 1's output; the root
    // original is long gone in this state
    assert(shadowed("/t/X-del11111111.graft",
      "/t/X-del11111111-upd22222222.graft") == Set("/t/X-del11111111.graft"))
    // intermediate ancestor gone (rewrite 1 completed, rewrite 2 crashed,
    // then the root was somehow resurrected): the walk continues past the
    // missing X-del to shadow the live root — without it the root's
    // pre-rewrite rows would double-count against the deepest output
    assert(shadowed("/t/X.graft",
      "/t/X-del11111111-upd22222222.graft") == Set("/t/X.graft"))
    // degenerate double-crash state: every live parent is shadowed by its
    // nearest descendant, so the deepest output alone serves
    assert(shadowed("/t/X.graft", "/t/X-del11111111.graft",
      "/t/X-del11111111-upd22222222.graft") ==
      Set("/t/X.graft", "/t/X-del11111111.graft"))
  }

  test("never shadows across partition directories or on non-marker names") {
    // same base name in different k=v dirs: legal, unrelated files
    assert(shadowed("/t/a=1/X.graft", "/t/a=2/X-del12345678.graft").isEmpty)
    // writer part names, foreign tags, short/long hashes: not markers
    assert(shadowed("/t/part-00003-c4a1b2d3-0001.graft",
      "/t/part-00003-c4a1b2d3.graft").isEmpty)
    assert(shadowed("/t/X.graft", "/t/X-foo12345678.graft").isEmpty)
    assert(shadowed("/t/X.graft", "/t/X-del1234567.graft").isEmpty)
    assert(shadowed("/t/X.graft", "/t/X-del123456789.graft").isEmpty)
  }

  test("dedupTwins drops exactly the shadowed originals") {
    val in = Seq("/t/X.graft", "/t/X-del12345678.graft", "/t/Y.graft").map(st)
    assert(GraftUtil.dedupTwins(in).map(_.getPath.toUri.getPath) ==
      Seq("/t/X-del12345678.graft", "/t/Y.graft"))
    // clean listing passes through untouched (same instance, zero cost)
    val clean = Seq("/t/A.graft", "/t/B.graft").map(st)
    assert(GraftUtil.dedupTwins(clean) eq clean)
  }
}
