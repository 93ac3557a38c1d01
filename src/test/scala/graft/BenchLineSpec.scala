package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-artifact contract of the COMPACT bench summary
  * line: the driver parses the LAST ~2000 stdout chars, and a fixed
  * keep=50 overran that window in round 11 (after the uniform-gate
  * quad + `published_clean_n` landed), nulling BENCH_r11.parsed — the
  * third recurrence of the BENCH_r01–r03 failure class. The line now
  * auto-shrinks its verbatim-query count until it fits
  * [[Bench.CompactBudgetChars]]; these tests assert the bound at
  * 300-query scale with EVERY optional field present, so growth in
  * queries or gate fields can never silently push the artifact past
  * the tail window again. */
class BenchLineSpec extends AnyFunSuite {

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  private def allGateFields: String =
    // the round-13 attempt/disk/regression fields ride in the same
    // env slot in production — included here so the budget bound
    // covers a worst-case line with every optional field present
    """"attempts":3,"attempt_clean_n":[150,201,290],""" +
      """"disk_probe_min":0.012,"disk_probe_max":1.943,""" +
      """"regressed_vs_prev_n":14,"regressed_vs_prev":[""" +
      (1 to 12).map(i => Bench.jq(f"q$i%03d_reasonably_long_query_name"))
        .mkString(",") + "]," +
      """"last_clean_total":212.03,"last_clean_n":237,""" +
      Bench.recallGateJson(0.8089, 0.75, ok = true) +
      Bench.pinnedGateJson(Bench.PinnedRecallGate.Mixture20k,
        Some((0.9794, 72.93, true))) +
      Bench.pinnedGateJson(Bench.PinnedRecallGate.Uniform20k,
        Some((0.9097, 66.21, true)))

  private def envAllFields(noiseJson: String): String =
    Bench.envString(passes = 3,
      passTotalsJson = "[342.10,224.00,219.30]",
      passLoadsJson = "[5.70,1.20,0.80]",
      probeMin = 0.41, probeMax = 23.20,
      remeasuredN = 12, publishedCleanN = 300,
      noiseJson = noiseJson,
      lockWait = 123.45, cpuSec = 4200.55,
      load1Start = 5.70, load1End = 0.80,
      gateFields = allGateFields, cpus = "32")

  test("compact line fits the tail budget at 300 queries with every gate field present") {
    val pmin = (1 to 300).map(i =>
      (f"q$i%03d_reasonably_long_query_name", 300.37 - i * 0.37))
    val total = pmin.collect { case (_, v) if v >= 0 => v }.sum
    val line = Bench.renderCompact(pmin, total, envAllFields, Nil,
      "/root/testdata/sf0.1", Nil)
    assert(line.length <= Bench.CompactBudgetChars,
      s"compact line is ${line.length} chars > budget ${Bench.CompactBudgetChars}")
    val root = om.readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("unit").asText() == "sec")
    // self-reconciling: shown queries + folded remainder = all queries
    assert(root.get("queries").size() + root.get("other_n").asInt() == 300)
    assert(root.get("queries").size() > 0,
      "the budget must still leave room for the slowest queries verbatim")
    // the gate fields survived the shrink — they are part of the artifact
    assert(root.get("mrdf_recall_gate").asText() == "PASS")
    assert(root.get("scaled_recall_gate").asText() == "PASS")
    assert(root.get("uniform_recall_gate").asText() == "PASS")
    assert(root.get("published_clean_n").asInt() == 300)
    // value reconciles with shown + folded (within 2-dp rendering slack)
    val shown = {
      val it = root.get("queries").elements()
      var s = 0.0
      while (it.hasNext) s += it.next().asDouble()
      s
    }
    assert(math.abs(shown + root.get("other_sec").asDouble()
      - root.get("value").asDouble()) < 0.01 * 300)
  }

  test("noise_suspect and failed maps still shrink the line under budget") {
    val pmin = (1 to 300).map(i =>
      (f"q$i%03d_reasonably_long_query_name", 300.37 - i * 0.37))
    val total = pmin.map(_._2).sum
    val noise = (1 to 8).map(i => f"q$i%03d_reasonably_long_query_name")
    val err = (1 to 3).map(i =>
      (s"q_broken_$i", "SparkException: boom " + "x" * 40))
    val line = Bench.renderCompact(pmin, total, envAllFields, err,
      "/root/testdata/sf0.1", noise)
    assert(line.length <= Bench.CompactBudgetChars,
      s"compact line is ${line.length} chars > budget ${Bench.CompactBudgetChars}")
    val root = om.readTree(line)
    assert(root.get("failed").size() == 3)
    assert(root.get("noise_suspect").size() == 8)
    assert(root.get("queries").size() + root.get("other_n").asInt() == 300)
  }

  test("a mass-failure run folds the failed map to failed_n + names and stays under budget") {
    // round-12 advice: ~8+ failed entries × ~200-char exception text
    // blew the budget even at keep=0 with the noise list folded —
    // exactly the runs where the driver most needs a parseable line
    val pmin = (1 to 300).map(i =>
      (f"q$i%03d_reasonably_long_query_name", 300.37 - i * 0.37))
    val total = pmin.map(_._2).sum
    val noise = (1 to 110).map(i => f"q$i%03d_reasonably_long_query_name")
    val err = (1 to 20).map(i =>
      (f"q_broken_query_number_$i%02d", "SparkException: " + "y" * 190))
    val line = Bench.renderCompact(pmin, total, envAllFields, err,
      "/root/testdata/sf0.1", noise)
    assert(line.length <= Bench.CompactBudgetChars,
      s"compact line is ${line.length} chars > budget ${Bench.CompactBudgetChars}")
    val root = om.readTree(line)
    assert(root.get("failed_n").asInt() == 20,
      "the folded count must replace the error map")
    assert(root.get("failed") == null)
    assert(root.get("failed_names").size() > 0,
      "a truncated name subset must survive the fold")
    assert(root.get("noise_suspect_n").asInt() == 110)
    assert(root.get("queries").size() + root.get("other_n").asInt() == 300)
  }

  test("a dirty-window run with 110 noise suspects folds the list to a count and stays under budget") {
    // round-12's first closing attempt: the adjudicator flagged 110
    // queries and the NAME LIST alone pushed the compact line to ~3 kB
    // with zero queries shown — the artifact must fold the list, not
    // blow the tail window
    val pmin = (1 to 300).map(i =>
      (f"q$i%03d_reasonably_long_query_name", 300.37 - i * 0.37))
    val total = pmin.map(_._2).sum
    val noise = (1 to 110).map(i => f"q$i%03d_reasonably_long_query_name")
    val line = Bench.renderCompact(pmin, total, envAllFields, Nil,
      "/root/testdata/sf0.1", noise)
    assert(line.length <= Bench.CompactBudgetChars,
      s"compact line is ${line.length} chars > budget ${Bench.CompactBudgetChars}")
    val root = om.readTree(line)
    assert(root.get("noise_suspect_n").asInt() == 110,
      "the folded count must replace the name list")
    assert(root.get("noise_suspect") == null)
    assert(root.get("queries").size() > 0,
      "folding the noise list must win back room for the slowest queries")
    assert(root.get("queries").size() + root.get("other_n").asInt() == 300)
  }

  private val Sf01 = "/root/testdata/sf0.1"

  test("bench history round-trips and the bootstrap refuses a dirty full-line artifact") {
    val dir = java.nio.file.Files.createTempDirectory("bench-hist-spec")
    val hist = dir.resolve("history.json").toString
    val fallback = dir.resolve("bench_out.json").toString
    // no files at all -> no history
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
    // a DIRTY full-line artifact (clean_n below the floor) must not
    // bootstrap the carried headline / >=2x baseline
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fallback),
      """{"metric":"total","value":306.58,"queries":{"qa":1.00,"qb":2.00},""" +
        """"published_clean_n":1,"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
    // a clean one does
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fallback),
      """{"metric":"total","value":212.03,"queries":{"qa":1.00,"qb":2.00},""" +
        """"published_clean_n":2,"sf":"/root/testdata/sf0.1"}""")
    val boot = Bench.loadHistory(Sf01, hist, fallback)
    assert(boot.exists(h => h.total == 212.03 && h.queries("qb") == 2.0))
    // an explicit saveHistory supersedes the fallback
    Bench.saveHistory(199.5, 2, 2, Seq("qa" -> 0.9, "qb" -> 1.9), Sf01, hist)
    val h = Bench.loadHistory(Sf01, hist, fallback).get
    assert(h.total == 199.5 && h.n == 2 && h.cleanN == 2 &&
      h.queries == Map("qa" -> 0.9, "qb" -> 1.9))
  }

  test("history is sf-stamped: a baseline from a different SF (or with no sf) is discarded") {
    // round-13 advice (medium): a full run at a different SF inherited
    // a mismatched >=2x baseline -> spurious regressed_vs_prev names
    // and a misleading carried last_clean_total
    val dir = java.nio.file.Files.createTempDirectory("bench-hist-sf-spec")
    val hist = dir.resolve("history.json").toString
    val fallback = dir.resolve("bench_out.json").toString
    Bench.saveHistory(199.5, 2, 2, Seq("qa" -> 0.9, "qb" -> 1.9), Sf01, hist)
    assert(Bench.loadHistory(Sf01, hist, fallback).nonEmpty)
    assert(Bench.loadHistory("/root/testdata/sf0.01", hist, fallback).isEmpty,
      "a history recorded at sf0.1 must not baseline an sf0.01 run")
    // pre-round-14 history shape (no sf field) cannot be verified -> discarded
    java.nio.file.Files.writeString(java.nio.file.Paths.get(hist),
      """{"total":199.50,"n":2,"clean_n":2,"queries":{"qa":0.90}}""")
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
    // fallback artifacts from the wrong SF are rejected too
    java.nio.file.Files.delete(java.nio.file.Paths.get(hist))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fallback),
      """{"metric":"total","value":21.20,"queries":{"qa":1.00,"qb":2.00},""" +
        """"published_clean_n":2,"sf":"/root/testdata/sf0.01"}""")
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
  }

  test("partial and subset artifacts never bootstrap the history baseline") {
    // a deadline-aborted (partial) or GRAFT_ONLY (subset) bench_out.json
    // is not a full-suite number: its total would be carried as
    // last_clean_total and its per-query walls as the >=2x baseline
    val dir = java.nio.file.Files.createTempDirectory("bench-hist-part-spec")
    val hist = dir.resolve("history.json").toString
    val fallback = dir.resolve("bench_out.json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fallback),
      """{"metric":"total","value":80.10,"queries":{"qa":1.00,"qb":2.00},""" +
        """"published_clean_n":2,"partial":true,"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(fallback),
      """{"metric":"total","value":8.10,"queries":{"qa":1.00,"qb":2.00},""" +
        """"published_clean_n":2,"subset":true,"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.loadHistory(Sf01, hist, fallback).isEmpty)
  }

  test("deadlineAllows: projected work must fit before the deadline with the safety margin") {
    // round-13 verdict #1a: the attempt/requeue loop never asked how
    // much time was left and the driver killed the run (rc=124)
    assert(Bench.deadlineAllows(elapsedSec = 100, deadlineSec = 1500,
      projectedSec = 400))
    assert(!Bench.deadlineAllows(elapsedSec = 1200, deadlineSec = 1500,
      projectedSec = 400),
      "1200 + 400*1.15 overruns 1500 - the pass must not start")
    // margin applies: 1000 + 450*1.15 = 1517.5 > 1500
    assert(!Bench.deadlineAllows(elapsedSec = 1000, deadlineSec = 1500,
      projectedSec = 450))
    // a non-positive projection only requires remaining budget > 0
    assert(Bench.deadlineAllows(elapsedSec = 1499, deadlineSec = 1500,
      projectedSec = -1))
    assert(!Bench.deadlineAllows(elapsedSec = 1501, deadlineSec = 1500,
      projectedSec = -1))
  }

  test("a deadline-aborted partial emission still renders a parseable compact line under budget") {
    // round-13 verdict #1 'done' criterion: a deadline-abort must leave
    // a parseable final line carrying last_clean_total — the exact
    // field set production emits mid-run (partial + deadline_abort +
    // gates_skipped + the carried clean headline)
    val fields =
      """"attempts":2,"attempt_clean_n":[150],""" +
        """"partial":true,"deadline_abort":true,""" +
        """"gates_skipped":"deadline",""" +
        """"last_clean_total":212.03,"last_clean_n":237,"""
    def env(noiseJson: String): String =
      Bench.envString(passes = 3, passTotalsJson = "[342.10]",
        passLoadsJson = "[5.70]", probeMin = 0.41, probeMax = 23.20,
        remeasuredN = 0, publishedCleanN = 150, noiseJson = noiseJson,
        lockWait = 0.0, cpuSec = 900.00, load1Start = 5.70,
        load1End = 6.10, gateFields = fields, cpus = "32")
    val pmin = (1 to 300).map(i =>
      (f"q$i%03d_reasonably_long_query_name", 300.37 - i * 0.37))
    val total = pmin.map(_._2).sum
    val noise = (1 to 110).map(i => f"q$i%03d_reasonably_long_query_name")
    val line = Bench.renderCompact(pmin, total, env, Nil, Sf01, noise)
    assert(line.length <= Bench.CompactBudgetChars,
      s"compact line is ${line.length} chars > budget ${Bench.CompactBudgetChars}")
    val root = om.readTree(line)
    assert(root.get("deadline_abort").asBoolean())
    assert(root.get("partial").asBoolean())
    assert(root.get("gates_skipped").asText() == "deadline")
    assert(root.get("last_clean_total").asDouble() == 212.03,
      "the carried clean headline must survive the shrink")
    assert(root.get("value").asDouble() > 0)
  }

  test("small suites keep every query verbatim (no needless folding)") {
    val pmin = (1 to 20).map(i => (f"q$i%02d_name", i * 1.0))
    val line = Bench.renderCompact(pmin, pmin.map(_._2).sum,
      envAllFields, Nil, "/root/testdata/sf0.01", Nil)
    val root = om.readTree(line)
    assert(root.get("queries").size() == 20)
    assert(root.get("other_n").asInt() == 0)
  }
}
