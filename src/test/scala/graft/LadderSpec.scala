package graft

/** The opt-in ladder rungs (`SparkEntry.ladderQueries`) are negative
  * PERFORMANCE results, not alternative semantics: every rung must produce
  * its oracle-checked anchor's result row-for-row — the l2f rungs against
  * `l2f_decontam` (native md5p48 anchor), `p5_jackson` against
  * `p5_validity_filter` (native json_long anchor). This is the correctness
  * coverage the rungs had when they sat in the oracle-checked suite — kept
  * engine-internal now that only BenchHeavy runs them. (The xxh rungs
  * agree unless a 64-bit shingle collision exists in the fixture;
  * equality doubles as that check, the same argument the l2f_gen oracle
  * makes.) */
class LadderSpec extends SparkSpecBase {

  /** Which oracle-checked suite query each rung must reproduce. */
  private val anchorOf: Map[String, String] =
    Map("p5_jackson" -> "p5_validity_filter").withDefaultValue("l2f_decontam")

  test("every ladder rung equals its oracle-checked anchor") {
    val anchors = SparkEntry.ladderQueries.keys.map(anchorOf(_)).toSet
      .map { (a: String) =>
        a -> SparkEntry.queries(a)(spark, sfDir)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      }.toMap
    anchors.foreach { case (a, rows) =>
      assert(rows.nonEmpty, s"anchor $a result is empty — fixture regression")
    }
    for ((name, fn) <- SparkEntry.ladderQueries) {
      val got = fn(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === anchors(anchorOf(name)),
        s"$name diverged from ${anchorOf(name)}")
    }
  }
}
