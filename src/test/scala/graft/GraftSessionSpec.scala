package graft

/** The deployment surface: a GraftSession-configured session has the
  * native function installed via extensions and the tuning knobs set. */
class GraftSessionSpec extends SparkSpecBase {

  test("tuned builder sets the scale knobs and installs graft extensions") {
    // the shared spec session already exists; verify conf mechanics on a
    // fresh session in the same JVM via newSession + manual registration
    val s = spark.newSession()
    graft.plans.DotF32.register(s)
    import s.implicits._
    val r = s.sql("SELECT dot_f32(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").head().getDouble(0)
    assert(r === 11.0)
  }

  test("GraftExtensions class wires dot_f32 as an injected function") {
    val ext = new graft.plans.GraftExtensions
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(exts) // must not throw; full-session wiring needs a new JVM
  }
}
