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

  // ---- snapshot parsing: the gate deciding whether an oracle comparison
  // ships at all -------------------------------------------------------

  test("parseSnapshot refuses a snapshot from a different scale factor") {
    val txt = """{"sf": "sf0.01", "times": {"q1_agg": 0.5}}"""
    assert(Bench.parseSnapshot(txt, "sf0.1").isEmpty,
      "a stale sf0.01 snapshot must never denominate an sf0.1 ratio")
    assert(Bench.parseSnapshot(txt, "sf0.01").contains(Map("q1_agg" -> 0.5)))
  }

  test("parseSnapshot accepts both indented and compact sf fields") {
    assert(Bench.parseSnapshot("""{"sf":"sf0.1","times":{"q2_x":1.25}}""",
      "sf0.1").contains(Map("q2_x" -> 1.25)))
  }

  test("parseSnapshot preserves timeout sentinels and refuses empty maps") {
    val m = Bench.parseSnapshot(
      """{"sf": "sf0.1", "times": {"q28_minhash": -1.0, "q1_agg": 2.0}}""",
      "sf0.1").get
    assert(m("q28_minhash") == -1.0 && m("q1_agg") == 2.0)
    assert(Bench.parseSnapshot("""{"sf": "sf0.1", "times": {}}""",
      "sf0.1").isEmpty, "right sf but zero queries must fall back to no-oracle")
  }

  test("parseSnapshot ignores non-query metadata fields") {
    // cap_sec/threads/runs must not parse as query entries
    val m = Bench.parseSnapshot(
      """{"sf": "sf0.1", "cap_sec": 30.0, "threads": 32, "runs": 2,
        | "times": {"q9_hist": 0.1}}""".stripMargin, "sf0.1").get
    assert(m == Map("q9_hist" -> 0.1))
  }

  // ---- adjudication candidate selection + weak set ----------------------

  test("adjudicationCandidates: >=1s AND >=2x, timeouts excluded") {
    val results = Seq("fast_ok" -> 0.4, "slow_2x" -> 2.0, "slow_fastoracle" -> 1.2,
      "slow_timeout" -> 9.0, "borderline" -> 1.0)
    val oracle = Map("fast_ok" -> 0.05, "slow_2x" -> 0.9,
      "slow_fastoracle" -> 1.0, "slow_timeout" -> -1.0, "borderline" -> 0.5)
    val cands = Bench.adjudicationCandidates(results, oracle).map(_._1)
    assert(cands == Seq("slow_2x", "borderline"),
      "sub-1s-with-trivial-oracle and oracle-timeout queries must never " +
        s"enter adjudication; got $cands")
  }

  test("adjudicationCandidates: oracle floor closes the sub-second blind spot") {
    // the round-14 q63 shape: 0.9 s in-suite vs a 0.39 s oracle = 2.3x —
    // under the old >=1s-only gate this never adjudicated; with the
    // oracle >= 0.2 s floor it must
    val results = Seq("q63_shape" -> 0.9, "job_floor" -> 0.45,
      "real_but_ok" -> 0.35)
    val oracle = Map("q63_shape" -> 0.39,
      // 75x ratio but the oracle answered from metadata — the Spark job
      // floor explains the whole gap, must stay excluded
      "job_floor" -> 0.006,
      // oracle did real work but Spark is under 2x — excluded
      "real_but_ok" -> 0.30)
    val cands = Bench.adjudicationCandidates(results, oracle).map(_._1)
    assert(cands == Seq("q63_shape"), s"got $cands")
  }

  test("weakAfterAdjudication prefers the same-window oracle denominator") {
    // solo 1.5 s vs snapshot 0.5 s = 3x (weak) BUT same-window 1.0 s = 1.5x
    val cleared = ("q_win", 3.0, 1.5, 0.5, Some(1.0))
    // solo 1.5 s vs snapshot 0.5 s = 3x, no same-window obtained -> weak
    val stillWeak = ("q_weak", 3.0, 1.5, 0.5, None)
    // solo dropped under 1 s AND the oracle is trivial -> never weak
    val fastNow = ("q_fast", 3.0, 0.4, 0.1, None)
    // sub-second solo but the oracle denominator is real work (>=0.2 s)
    // at >2x -> weak (the same two-sided gate as candidate selection)
    val subSecReal = ("q_subsec", 1.2, 0.9, 0.39, None)
    assert(Bench.weakAfterAdjudication(
      Seq(cleared, stillWeak, fastNow, subSecReal))
      == Seq("q_weak", "q_subsec"))
  }

  // ---- stdout truncation: the driver tail-capture contract --------------

  test("fitCount keeps the emitted line inside the stdout budget") {
    val entries = (1 to 50).map(i => f""""q${i}%02d_x":0.123""")
    val headLen = 300
    val budget = 600
    val fit = Bench.fitCount(entries, headLen, budget)
    assert(fit > 0 && fit < entries.size)
    val body = entries.take(fit).mkString(",")
    // reserve (120) covers the queries_note suffix + closing braces
    assert(headLen + body.length + 120 <= budget + entries.head.length,
      s"fit=$fit body=${body.length}")
    assert(Bench.fitCount(entries, headLen = 700, budget = 600) == 0,
      "oversized head must yield zero entries, not a negative count")
    assert(Bench.fitCount(Seq.empty, 0, 600) == 0)
    assert(Bench.fitCount(entries, 0, 100000) == entries.size)
  }

  // ---- protocol-drift guard: Bench's embedded worker vs dev script ------

  test("embedded oracle worker agrees with dev/bench_oracle.py on tables") {
    val dev = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("dev/bench_oracle.py")), "UTF-8")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      assert(Bench.oracleWorkerPy.contains("\"" + t + "\""),
        s"embedded worker lost table $t")
      assert(dev.contains("\"" + t + "\""),
        s"dev/bench_oracle.py lost table $t")
    }
    // same timing protocol: both must cap and thread identically
    assert(Bench.oracleWorkerPy.contains("SET threads TO"))
    assert(dev.contains("SET threads TO"))
  }
}
