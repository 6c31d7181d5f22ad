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

  /** Persist a bench JSON line next to the build (parent dirs created):
    * stdout capture may truncate long lines; the file never does. */
  def writeArtifact(path: String, line: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, (line + "\n").getBytes("UTF-8"))
  }
}
