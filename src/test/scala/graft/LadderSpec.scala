package graft

/** The opt-in l2f ladder rungs (`SparkEntry.ladderQueries`) are negative
  * PERFORMANCE results, not alternative semantics: every rung must produce
  * the suite's `l2f_decontam` (native md5p48 anchor) result row-for-row.
  * This is the correctness coverage the rungs had when they sat in the
  * oracle-checked suite — kept engine-internal now that only BenchHeavy
  * runs them. (The xxh rungs agree unless a 64-bit shingle collision
  * exists in the fixture; equality doubles as that check, the same
  * argument the l2f_gen oracle makes.) */
class LadderSpec extends SparkSpecBase {

  test("every ladder rung equals the suite's l2f_decontam anchor") {
    val anchor = SparkEntry.queries("l2f_decontam")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(anchor.nonEmpty, "anchor result is empty — fixture regression")
    for ((name, fn) <- SparkEntry.ladderQueries) {
      val got = fn(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === anchor, s"$name diverged from l2f_decontam")
    }
  }
}
