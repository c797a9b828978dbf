package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench measurement tooling — the same-window DuckDB oracle worker the
  * spike adjudicator uses (round-11 verdict item 1). The worker shells
  * out to python3+duckdb, which this image carries for driver-side
  * oracle work; if either is absent the helper must degrade to None
  * (Bench then falls back to the snapshot oracle), never throw.
  */
class BenchToolingSpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor(20, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: Throwable => false }

  test("timeOracleSameWindow times a real query against the sf tables") {
    assume(duckdbAvailable, "python3+duckdb not in this image")
    val t = Bench.timeOracleSameWindow("/root/testdata/sf0.001",
      "SELECT count(*) FROM documents WHERE lang = 'en'")
    assert(t.isDefined, "worker should return a timing")
    assert(t.get > 0.0 && t.get < 30.0)
  }

  test("timeOracleSameWindow returns None on broken SQL, never throws") {
    assume(duckdbAvailable, "python3+duckdb not in this image")
    assert(Bench.timeOracleSameWindow("/root/testdata/sf0.001",
      "SELECT FROM no_such_table WHERE").isEmpty)
  }
}
