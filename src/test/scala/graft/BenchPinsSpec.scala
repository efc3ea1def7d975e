package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays REAL official-record numbers through the bench pin logic —
  * the r12 lesson made mechanical: a pin calibrated only by live
  * weather is never tested, so the records that exposed each
  * mis-calibration become its permanent regression fixtures.
  */
class BenchPinsSpec extends AnyFunSuite {
  import BenchPins._

  // BENCH_r12.json's official lifecycle block, verbatim: t1 clean-ish,
  // BOTH t2 segment and prediction samples corrupted (the judge
  // measured segment 27.9 s / prediction 13.8 s canary-clean on the
  // same binary vs 73.6 / 24.4 shipped). The old 2.0 bar read the
  // segment ratio at 1.98 and stamped violated: false.
  private val r12t1 = (14.9, 9.269884181, 1.897938932, 3.441552085)
  private val r12t2 = (101.1, 73.55851744, 2.799251001, 24.369193358)
  private val r12t2Runs = Seq(
    (172.0, 94.255122678, 2.978254254, 74.327973006),
    (101.1, 73.55851744, 2.799251001, 24.369193358))

  test("the BENCH_r12 official record FLAGS: ratio bar 1.5 catches the " +
    "1.98 segment and 1.77 prediction ratios the 2.0 bar slipped") {
    val p = lifecyclePin(r12t1, r12t2, r12t2Runs, 25, 100)
    assert(p.segRatio > 1.9 && p.segRatio < 2.0, p.segRatio)
    assert(p.predRatio > 1.7 && p.predRatio < 1.8, p.predRatio)
    assert(p.violated, "the r12 artifact must flag under the new bars")
    // ...and the both-runs check flags the same block INDEPENDENTLY of
    // the ratio (the defense that survives even a bar mis-set): every
    // raw t2 sample of both stages exceeds 1.5x t1's per-chip cost
    assert(p.bothRuns.exists(_.contains("segment")) &&
      p.bothRuns.exists(_.contains("prediction")), p.bothRuns)
    // tile read wall ratio 1.47 — inside its own band; the pin names
    // the corrupted stages, not the whole record
    assert(p.tileWallRatio > 1.4 && p.tileWallRatio < 1.5)
  }

  test("the judge's clean r12 probe does NOT flag (ratios 0.60/0.62, " +
    "the healthy t2<t1 per-chip shape)") {
    // t2 segment 27.9 s / prediction 13.8 s measured canary-clean;
    // t1 back-derived from the reported clean ratios 0.60 / 0.62
    val t1 = (16.0, 11.625, 1.3, 5.565)
    val t2 = (44.0, 27.9, 1.8, 13.8)
    val t2Runs = Seq((47.0, 29.5, 1.9, 14.6), t2)
    val p = lifecyclePin(t1, t2, t2Runs, 25, 100)
    assert(math.abs(p.segRatio - 0.60) < 0.01, p.segRatio)
    assert(math.abs(p.predRatio - 0.62) < 0.01, p.predRatio)
    assert(!p.violated, p)
    assert(p.bothRuns.isEmpty, p.bothRuns)
  }

  test("a t1-side corruption (r12 run D's 0.28 segment ratio) trips " +
    "the low bar; a tile-only artifact trips the tile wall bars") {
    // t1 segment corrupted ~3x: per-chip 0.371 -> 1.3, ratio ~0.21
    val p = lifecyclePin((40.0, 33.0, 1.5, 5.5),
      (44.0, 27.9, 1.8, 13.8), Seq((44.0, 27.9, 1.8, 13.8)), 25, 100)
    assert(p.segRatio < RatioLow && p.violated, p)
    // tile-only: per-chip stages clean, tile wall 3.5x (the r12
    // ADVICE gap: the old pin never looked at tile at all)
    val q = lifecyclePin((16.0, 11.625, 1.5, 5.565),
      (50.0, 27.9, 5.25, 13.8), Seq((50.0, 27.9, 5.25, 13.8)), 25, 100)
    assert(q.tileWallRatio === 3.5 && q.violated, q)
  }

  test("the round-13 official record replays: lifecycle in-band at " +
    "0.647/1.16/0.934, x124 clean under its retargeted bar, x107 " +
    "stamps weather on the x75 elevation") {
    // records/bench_full_20260816T1908Z_sf0.1.json, verbatim
    val t1 = (13.0, 7.478, 2.230, 3.106)
    val t2 = (34.0, 19.339, 2.586, 11.602)
    val t2Runs = Seq((44.0, 19.339, 2.586, 21.981),
      (38.0, 24.072, 2.751, 11.602))
    val p = lifecyclePin(t1, t2, t2Runs, 25, 100)
    assert(!p.violated && p.bothRuns.isEmpty, p)
    assert(math.abs(p.segRatio - 0.647) < 0.01 &&
      math.abs(p.tileWallRatio - 1.160) < 0.01 &&
      math.abs(p.predRatio - 0.934) < 0.01, p)
    val refs = Seq(("x75_bm25_wand", 4.476, 3.3),
      ("x43_ann_ivfpq_trained", 4.141, 4.3))
    assert(classify(4.927, 6.5, enforced = true, -1.0, refs) == Clean)
    assert(classify(5.466, 3.5, enforced = true, 5.031,
      refs) == Weather)
  }

  test("deweather: the r12 official x107 reading classifies as " +
    "'weather' (x43 at 1.51x anchor), a refs-in-band excess as true, " +
    "a reprobe recovery as clean") {
    // BENCH_r12's actual pin inputs: x107 warm 12.05 s vs bar 3.5,
    // refs x75 4.098 (1.24x its 3.3 anchor) / x43 6.478 (1.51x 4.3)
    val r12refs = Seq(("x75_bm25_wand", 4.097943474, 3.3),
      ("x43_ann_ivfpq_trained", 6.478270151, 4.3))
    assert(classify(12.049541256, 3.5, enforced = true, 11.2,
      r12refs) == Weather)
    // a genuine regression: bar exceeded, re-probe confirms, refs in
    // band -> an unqualified true (the simulated-Thread.sleep case)
    val inBand = Seq(("x75_bm25_wand", 3.0, 3.3),
      ("x43_ann_ivfpq_trained", 4.0, 4.3))
    assert(classify(9.0, 3.5, enforced = true, 8.8, inBand) == Violated)
    // a one-shot spike the min-of-3 re-probe sheds never stamps
    assert(classify(4.2, 3.5, enforced = true, 3.1, inBand) == Clean)
    // a contended record cannot enforce the pin honestly
    assert(classify(9.0, 3.5, enforced = false, -1.0, inBand) == Clean)
    // JSON spellings are machine-distinct
    assert(Weather.json == "\"weather\"" && Violated.json == "true")
  }

  test("ref-run instability: the r13 23:28 record (refs 1.23-1.24x — " +
    "just under the level gate — with runs falling 1.45-1.49x through " +
    "an oscillation) classifies weather; tight in-band refs keep a " +
    "genuine excess true") {
    // records/x107_release_manifest_20260816T232849Z.json, verbatim:
    // the level gate's hard 1.3 cliff let a mid-transition window
    // stamp an unqualified true
    val refs = Seq(("x75_bm25_wand", 4.057, 3.3),
      ("x43_ann_ivfpq_trained", 5.343, 4.3))
    val runs = Seq(Seq(5.872, 4.496, 4.057), Seq(7.966, 5.707, 5.343))
    assert(classify(4.827, 3.5, enforced = true, -1.0, refs,
      runs) == Weather)
    // the same ref LEVELS measured in a STABLE window (tight runs):
    // the excess is the code, not the box — still true
    val tight = Seq(Seq(4.057, 4.101, 4.063), Seq(5.343, 5.410, 5.391))
    assert(classify(4.827, 3.5, enforced = true, -1.0, refs,
      tight) == Violated)
    // no runs available (the Bench warm-sweep path): level gate only,
    // behavior unchanged
    assert(classify(4.827, 3.5, enforced = true, -1.0,
      refs) == Violated)
    // spreads from tonight's STABLE windows (1.06-1.16) sit well
    // under the 1.35 factor
    val stable = Seq(Seq(4.809, 4.806, 5.109))
    assert(classify(4.827, 3.5, enforced = true, -1.0, refs,
      stable) == Violated)
  }
}
