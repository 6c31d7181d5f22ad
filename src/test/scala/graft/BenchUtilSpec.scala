package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The round driver's artifact capture keeps only the last ~2000 chars of
  * Bench's stdout (BENCH_r07/r08 both recorded `parsed: null` with a
  * mid-line tail). `compactLine` is the fix: the printed line must stay
  * inside the capture window, stay valid JSON, and spend its budget on
  * the slowest queries (the signal) rather than the job-floor noise.
  */
class BenchUtilSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def parse(s: String): JValue = JsonMethods.parse(s)

  // Representative of the real suite: 117 entries with realistic name
  // lengths forces the budget fill to actually truncate.
  private val results: Seq[(String, Double)] =
    (1 to 117).map(i => (s"q${i}_some_operator_name_$i", i / 100.0))

  test("compact line fits the budget and is valid JSON") {
    val line = BenchUtil.compactLine(38.93, results, Nil,
      "/root/testdata/sf0.1", Seq(41.2, 39.0, 38.8), budget = 1850)
    assert(line.length <= 1850, s"line is ${line.length} chars")
    val j = parse(line)
    assert((j \ "metric") == JString("total"))
    assert(math.abs((j \ "value").values.asInstanceOf[Double] - 38.93) < 1e-9)
    assert((j \ "queries_total").values == 117L)
    assert((j \ "full") == JString("BENCHFULL.json"))
    assert((j \ "sweep_walls").asInstanceOf[JArray].arr.size == 3)
  }

  test("budget is spent slowest-first") {
    val line = BenchUtil.compactLine(1.0, results, Nil, "sf", Seq(1.0), 1850)
    val qs = (parse(line) \ "queries").asInstanceOf[JObject].obj
    assert(qs.nonEmpty && qs.size < results.size) // truncation really happened
    val kept = qs.map(_._1).toSet
    val cutoff = qs.map(_._2.values.asInstanceOf[Double]).min
    // every omitted query is at least as fast as every kept one
    val omitted = results.filterNot { case (k, _) => kept(k) }
    assert(omitted.forall(_._2 <= cutoff + 1e-9))
  }

  test("failed queries always survive compaction") {
    val line = BenchUtil.compactLine(1.0, results, Seq("r5_dedup_stream"),
      "sf", Seq(1.0), 1850)
    val j = parse(line)
    assert((j \ "failed") == JArray(List(JString("r5_dedup_stream"))))
  }

  test("values are locale-independent 3-decimal") {
    val dflt = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // decimal comma
      val line = BenchUtil.compactLine(2.5, Seq(("q1", 0.1234)), Nil, "sf", Seq(2.5), 1850)
      val j = parse(line) // a "2,5" artifact would fail to parse
      assert((j \ "queries" \ "q1").values.asInstanceOf[Double] == 0.123)
    } finally java.util.Locale.setDefault(dflt)
  }
}
