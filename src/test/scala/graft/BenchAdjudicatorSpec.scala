package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.BenchAdjudicator.{M, cleanMin, clean, isSuspect, publish}

/** The round-10 verdict's two bench-evidence holes, pinned as unit
  * rules: (1) per-query minima must not be taken across probe-DIRTY
  * measurements; (2) a stall contained inside one query window (clean
  * brackets, inflated cpu) must be caught by cpu dispersion. The
  * first test is the literal q25 artifact from BENCH_r10. */
class BenchAdjudicatorSpec extends AnyFunSuite {

  private val floor = 0.5

  test("the q25 exhibit: dirty-bracket min is not published, in-window stall is cpu-flagged, re-measure resolves") {
    val probeMin = 0.66
    // pass 1: clean brackets but a stall INSIDE the window
    // (wall 35.22 s at cpu 76.5 vs 27.1/23.5 in the other passes)
    val p1 = M(35.22, 76.5, 0.81, 0.83)
    // pass 2: fastest wall, but its after-probe marks the window dirty
    val p2 = M(9.55, 27.1, 0.70, 2.05)
    // pass 3: dirty brackets too
    val p3 = M(11.0, 23.5, 1.20, 0.95)
    val ms = Seq(p1, p2, p3)
    assert(BenchAdjudicator.probeClean(p1, probeMin), "p1 brackets look clean")
    assert(!BenchAdjudicator.cpuClean(p1, ms), "cpu dispersion must flag the in-window stall")
    assert(!clean(p2, ms, probeMin) && !clean(p3, ms, probeMin))
    // r10 published 9.55 (min across everything, from the DIRTY pass);
    // the adjudicator refuses: no publishable clean value → suspect
    assert(cleanMin(ms, probeMin).isEmpty)
    assert(isSuspect(ms, probeMin, floor))
    // an individually-probed clean re-measure (the judge's own 3.10 s)
    // resolves it — published value comes from the clean window
    val re = M(3.10, 25.0, 0.70, 0.72)
    val all = ms :+ re
    assert(!isSuspect(all, probeMin, floor))
    assert(publish(all, probeMin) == ((3.10, true)))
  }

  test("clean min must AGREE with the global min: a 1.5x-faster dirty value blocks publication") {
    val probeMin = 0.5
    val ms = Seq(
      M(5.0, 10.0, 0.55, 0.6), // clean window
      M(2.0, 10.0, 3.0, 0.6)) // dirty window, suspiciously faster
    assert(cleanMin(ms, probeMin).isEmpty, "5.0 > 1.5 x 2.0 — the signals disagree")
    assert(isSuspect(ms, probeMin, floor))
    // published as the global min but NOT marked clean → the caller
    // lists it in noise_suspect
    assert(publish(ms, probeMin) == ((2.0, false)))
    // within the agree factor the clean value publishes
    val ok = Seq(M(2.4, 10.0, 0.55, 0.6), M(2.0, 10.0, 3.0, 0.6))
    assert(publish(ok, probeMin) == ((2.4, true)))
  }

  test("first-pass setup cpu within 2x stays clean; single measurement has no dispersion") {
    val probeMin = 0.5
    // pass 1 pays codegen/replay setup (1.8x cpu) — must NOT be flagged
    val ms = Seq(M(4.0, 18.0, 0.55, 0.6), M(3.8, 10.0, 0.55, 0.6))
    assert(ms.forall(clean(_, ms, probeMin)))
    assert(publish(ms, probeMin) == ((3.8, true)))
    // one sample: trivially cpu-clean, publishable if probe-clean
    assert(publish(Seq(M(1.0, 9.0, 0.55, 0.6)), probeMin) == ((1.0, true)))
  }

  test("sub-floor queries and failed runs keep their exemptions") {
    val probeMin = 0.5
    // all-dirty but sub-floor: never a suspect
    val tiny = Seq(M(0.2, 0.1, 3.0, 3.0), M(0.25, 0.1, 3.0, 3.0))
    assert(!isSuspect(tiny, probeMin, floor))
    // a failed run poisons the headline regardless of clean siblings
    val failed = Seq(M(-1.0, 0.0, 0.55, 0.6), M(2.0, 5.0, 0.55, 0.6))
    assert(publish(failed, probeMin) == ((-1.0, false)))
    assert(!isSuspect(failed, probeMin, floor), "failed queries report via errors, not noise_suspect")
  }

  test("disk signal: a storage-stalled window flags a disk-sensitive query but not others") {
    // the round-12 q184 blind spot: wall 2.2x with CPU probes clean at
    // 0.6 s and flat cpu — only the DISK brackets see the stall
    import BenchAdjudicator._
    val probeMin = 0.6
    val diskMin = 0.02
    val stalled = M(wall = 4.2, cpu = 10.4, pb = 0.62, pa = 0.64,
      db = 0.45, da = 0.38) // fsync 20x the best disk probe
    val quiet = M(wall = 1.9, cpu = 10.2, pb = 0.61, pa = 0.66,
      db = 0.025, da = 0.022)
    // disk-sensitive: the stalled measurement is NOT clean, the quiet
    // one is — publish picks the quiet min, provably clean
    assert(!clean(stalled, Seq(stalled, quiet), probeMin, diskMin))
    assert(clean(quiet, Seq(stalled, quiet), probeMin, diskMin))
    assert(publish(Seq(stalled, quiet), probeMin, diskMin) == (1.9, true))
    // a stalled-only run has NO publishable clean value -> suspect
    assert(isSuspect(Seq(stalled, stalled), probeMin, 0.5, diskMin))
    // NOT disk-sensitive (diskMin unset): the old two-signal verdict
    assert(clean(stalled, Seq(stalled, quiet), probeMin))
    assert(!isSuspect(Seq(stalled, stalled), probeMin, 0.5))
    // absolute floor: a 35 ms bracket over a 10 ms best never flags
    assert(diskClean(M(1.0, 1.0, 0.6, 0.6, db = 0.035, da = 0.03), 0.01))
  }

  test("cpu floor: micro-cpu jitter below 0.25 s never flags") {
    val probeMin = 0.5
    // 0.02 vs 0.15 cpu is 7.5x dispersion but both under the floor band
    val ms = Seq(M(0.9, 0.02, 0.55, 0.6), M(0.8, 0.15, 0.55, 0.6))
    assert(ms.forall(clean(_, ms, probeMin)))
  }
}
