package graft

/** Shared bits of the Bench/BenchHeavy sweep harnesses. */
object BenchUtil {

  /** LOWER median: with an even sample count (a sweep failed) and one
    * contaminated slow sample among the survivors, the upper-middle pick
    * would select the contaminated one — prefer the uncontaminated side.
    * (Odd counts are the true median either way.) */
  def median(v: Vector[Double]): Double = {
    val s = v.sorted
    s((s.size - 1) / 2)
  }
}
