package graft

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions must register every native function into a session
  * configured ONLY with `spark.sql.extensions` — the deployment path for
  * clusters where no graft code runs before SQL. A session built with
  * extensions can't coexist with the suite-shared one (getOrCreate reuses
  * it and ignores the extensions conf), so the check runs in a clean JVM. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions registers all functions") {
    val out = Seq("java", "-cp", sys.props("java.class.path"),
      "graft.tools.ExtCheck").!!
    assert(out.contains("EXTOK"), s"ExtCheck output:\n$out")
  }
}
