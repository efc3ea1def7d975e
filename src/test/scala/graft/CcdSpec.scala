// golden-fit coefficient recovery added below the behavioral tests
package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.core.PixelTimeseries
import graft.ops.HarmonicCcd

/** CCD kernel contract tests (SURVEY §7.4 hard part 1): segment
  * structure, break detection, default-sentinel semantics. */
class CcdSpec extends AnyFunSuite {

  private def ordinal(iso: String): Int =
    (LocalDate.parse(iso).toEpochDay + 719163L).toInt

  /** 16-day cadence series with an annual harmonic + deterministic noise;
    * optional step change of `step` at observation index `breakAt`. */
  private def synth(n: Int = 230, step: Double = 0.0, breakAt: Int = -1)
      : PixelTimeseries = {
    val t0 = ordinal("1985-01-03")
    val dates = Array.tabulate(n)(i => t0 + 16 * i)
    def band(base: Double, amp: Double): Array[Int] =
      Array.tabulate(n) { i =>
        val t = dates(i).toDouble
        val noise = ((i % 7) - 3) * 4.0
        val shift = if (breakAt >= 0 && i >= breakAt) step else 0.0
        (base + amp * math.sin(2 * math.Pi * t / 365.25) + noise + shift).toInt
      }
    PixelTimeseries(
      cx = -2061585L, cy = 1922805L, px = 0L, py = 0L,
      dates = dates,
      blues = band(800, 120), greens = band(900, 140), reds = band(1000, 160),
      nirs = band(3000, 500), swir1s = band(2000, 300),
      swir2s = band(1500, 250), thermals = band(2800, 400),
      qas = Array.fill(n)(0))
  }

  test("stable series -> one segment, 7 coefs/band, chprob 0") {
    val det = HarmonicCcd().detect(synth())
    assert(det.segments.size == 1)
    val s = det.segments.head
    assert(s.chprob == 0.0)
    assert(s.blcoef.length == 7 && s.thcoef.length == 7)
    assert(s.sday.toString == "1985-01-03")
    assert(s.sday.compareTo(s.eday) < 0 && s.eday == s.bday)
    // harmonic fit should recover the series: rmse ~ noise scale
    assert(s.blrmse > 0 && s.blrmse < 50, s"blrmse=${s.blrmse}")
    // intercept + slope*t ~ base level at mid-series
    val mid = ordinal("1990-01-01").toDouble
    val level = s.niint + s.nicoef(0) * mid
    assert(math.abs(level - 3000) < 200, s"ni level=$level")
  }

  test("step change -> two segments with a break") {
    val det = HarmonicCcd().detect(synth(step = 900.0, breakAt = 115))
    assert(det.segments.size == 2, s"got ${det.segments.size}")
    val first = det.segments.head
    val second = det.segments(1)
    assert(first.chprob == 1.0 && second.chprob == 0.0)
    assert(first.bday == second.sday) // break day starts the next segment
    assert(first.blmag > 0.0)
    assert(first.eday.compareTo(second.sday) < 0)
  }

  test("all observations masked -> single default segment") {
    val ts = synth().copy(qas = Array.fill(230)(1)) // nothing clear
    val det = HarmonicCcd().detect(ts)
    assert(det.segments.size == 1)
    val s = det.segments.head
    assert(s.sday.toString == "0001-01-01" && s.eday == s.sday &&
      s.bday == s.sday)
    assert(s.blcoef.isEmpty && s.chprob == 0.0 && s.blrmse == 0.0)
    assert(det.mask.forall(_ == 0))
  }

  test("too few clear observations -> default segment") {
    val full = synth(n = 8)
    val det = HarmonicCcd().detect(full)
    assert(det.segments.size == 1)
    assert(det.segments.head.sday.toString == "0001-01-01")
  }

  test("mask marks exactly the non-clear observations") {
    val ts = synth()
    val qas = ts.qas.clone()
    qas(3) = 4; qas(10) = 4
    val det = HarmonicCcd().detect(ts.copy(qas = qas))
    assert(det.mask.count(_ == 0) == 2)
    assert(det.mask(3) == 0 && det.mask(10) == 0)
  }

  test("harmonic fit recovers known coefficients on a noiseless series") {
    // y = base + slope*t + amp*sin(wt) exactly; the solved model must
    // reproduce (intercept, slope, first sin coefficient) to high
    // precision — a golden check on the normal-equation math itself.
    val t0 = ordinal("1985-01-03")
    val n = 230
    val dates = Array.tabulate(n)(i => t0 + 16 * i)
    val w = 2.0 * math.Pi / 365.25
    val base = 500000.0; val slope = 0.6; val amp = 2000.0
    def series: Array[Int] = dates.map(t =>
      math.round(base + slope * t + amp * math.sin(w * t)).toInt)
    val flat = Array.fill(n)(1000)
    val ts = PixelTimeseries(0, 0, 0, 0, dates,
      series, flat, flat, flat, flat, flat, flat, Array.fill(n)(0))
    val seg = HarmonicCcd().detect(ts).segments.head
    // blue band carries the synthetic signal
    // tolerance floor set by the series' integer quantization (±0.5)
    assert(math.abs(seg.blcoef(0) - slope) < 5e-3,
      s"slope ${seg.blcoef(0)}")
    // re-based intercept: slope error is amplified by tRef (~7e5), so
    // the bound is tolerance(slope) * tRef
    assert(math.abs(seg.blint - base) < 4000, s"intercept ${seg.blint}")
    assert(math.abs(seg.blcoef(2) - amp) < 20, s"sin1 ${seg.blcoef(2)}")
    assert(seg.blrmse < 5, s"rmse ${seg.blrmse}") // rounding noise only
  }
}
