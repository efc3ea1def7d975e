package graft.ops

import java.sql.Date
import java.time.LocalDate
import graft.core.{PixelDetection, PixelTimeseries, Segment}

/** Per-pixel change detection behind a pluggable trait
  * (SURVEY.md §7.4 hard part 1): the reference calls the external PyCCD
  * library per pixel over a process pool
  * (ref: blackmagic/blueprints/segment.py:107-116,189-195). We implement
  * the CCDC recurrence directly — harmonic OLS fit per band + consecutive
  * -outlier break detection — as a pure Scala kernel invoked from
  * mapPartitions, so Spark tasks replace the Pool and the heavy per-key
  * compute stays off the codegen path by design (SURVEY §2.12).
  *
  * Contract preserved exactly where downstream logic depends on it:
  * - input: (dates, 7 band arrays, qas) per pixel
  * - output: 37-field segment rows; a single "default" row with
  *   sday=eday=bday=0001-01-01 and empty coefs when no model can be fit
  *   (ref: blackmagic/blueprints/segment.py:52-53,61-104) — the sentinel
  *   that F4/G1/U1 route on.
  * - 7 coefficients per band: slope + 3 annual-harmonic pairs; intercept
  *   kept separate so averageReflectance = int + coef(0)*ordinal (C1).
  *
  * Scale note: the fit is incremental — per-band normal-equation
  * accumulators (X'X, X'y, y'y) are rank-1-updated per observation and
  * SSE is recovered algebraically, so extending a segment by one
  * observation costs O(terms^2 + terms^3) instead of refitting the
  * window. One pixel with n clear obs costs O(n * 7 * 8^3) flops total.
  */
trait ChangeDetector extends Serializable {
  def detect(ts: PixelTimeseries): PixelDetection
}

/** CCDC-style detector.
  *
  * @param qaClear      QA values treated as clear observations
  * @param minObs       observations needed to fit a model (CCDC uses 12)
  * @param minSpanDays  minimum time span of the initial fit before change
  *                     tests begin (CCDC initializes on >= 1 year so the
  *                     harmonic terms are constrained over a full cycle)
  * @param peekWindow   consecutive outliers that declare a break (CCDC: 6)
  * @param changeThresh residual threshold in units of band RMSE
  * @param minBands     bands that must exceed the threshold together
  */
final case class HarmonicCcd(
    qaClear: Set[Int] = Set(0),
    minObs: Int = 12,
    minSpanDays: Double = 365.25,
    peekWindow: Int = 6,
    changeThresh: Double = 3.0,
    minBands: Int = 4) extends ChangeDetector {

  import HarmonicCcd._

  override def detect(ts: PixelTimeseries): PixelDetection = {
    val n = ts.dates.length
    // band order bl, gr, ni, re, s1, s2, th — the training-matrix order
    // (ref: blackmagic/segaux.py:248-275)
    val bands = Array(ts.blues, ts.greens, ts.nirs, ts.reds,
      ts.swir1s, ts.swir2s, ts.thermals)
    val mask = Array.tabulate(n)(i => if (qaClear(ts.qas(i))) 1 else 0)
    val idx = (0 until n).filter(mask(_) == 1).sortBy(ts.dates(_)).toArray
    val m = idx.length
    val t = Array.tabulate(m)(j => ts.dates(idx(j)).toDouble)
    val y = bands.map(b => Array.tabulate(m)(j => b(idx(j)).toDouble))

    val segs = scala.collection.mutable.ArrayBuffer.empty[Segment]
    var start = 0
    while (m - start >= minObs) {
      // center the linear term at the segment start: raw ordinals
      // (~7e5) make the intercept/slope Gram catastrophically
      // ill-conditioned; with t-tRef the solve is well-posed and the
      // stored intercept is re-based afterwards (toSegment) so the
      // ar = int + slope*ordinal contract is unchanged
      val tRef = t(start)
      val fits = Array.fill(NumBands)(new RunningFit)
      var end = start
      // initialization: at least minObs obs AND a full seasonal cycle, so
      // the harmonic terms are constrained before we test for change
      while (end < m &&
          (end - start < minObs || t(end - 1) - t(start) < minSpanDays)) {
        addObs(fits, t, y, end, tRef); end += 1
      }
      var models = fits.map(_.solve(termsFor(end - start)))
      var break_ = -1
      var done = false
      while (end < m && !done) {
        if (end + peekWindow <= m &&
            (end until end + peekWindow).forall(j =>
              isOutlier(models, t(j), y, j, tRef))) {
          break_ = end
          done = true
        } else {
          addObs(fits, t, y, end, tRef)
          end += 1
          models = fits.map(_.solve(termsFor(end - start)))
        }
      }
      val broke = break_ >= 0
      val eIdx = if (broke) break_ - 1 else m - 1
      val bIdx = if (broke) break_ else eIdx
      val mags =
        if (broke)
          magnitudes(models, t, y, break_, math.min(break_ + peekWindow, m),
            tRef)
        else Array.fill(NumBands)(0.0)
      segs += toSegment(ts, models, mags, tRef,
        sday = t(start).toInt, eday = t(eIdx).toInt, bday = t(bIdx).toInt,
        chprob = if (broke) 1.0 else 0.0, curqa = if (broke) 8 else 0)
      start = if (broke) break_ else m
    }

    val out =
      if (segs.isEmpty) Seq(Segment.default(ts.cx, ts.cy, ts.px, ts.py))
      else segs.toSeq
    PixelDetection(ts.cx, ts.cy, ts.px, ts.py, ts.dates, mask, out)
  }

  private def addObs(fits: Array[RunningFit], t: Array[Double],
      y: Array[Array[Double]], j: Int, tRef: Double): Unit = {
    val row = designRow(t(j), tRef)
    var b = 0
    while (b < NumBands) { fits(b).add(row, y(b)(j)); b += 1 }
  }

  private def isOutlier(models: Array[BandFit], ti: Double,
      y: Array[Array[Double]], j: Int, tRef: Double): Boolean = {
    val row = designRow(ti, tRef)
    var exceeded = 0
    var b = 0
    while (b < NumBands) {
      val rmse = math.max(models(b).rmse, 1e-9)
      if (math.abs(y(b)(j) - models(b).predict(row)) > changeThresh * rmse)
        exceeded += 1
      b += 1
    }
    exceeded >= minBands
  }

  /** Change magnitude: mean absolute prediction error over the peek
    * window per band (PyCCD reports per-band magnitudes at the break). */
  private def magnitudes(models: Array[BandFit], t: Array[Double],
      y: Array[Array[Double]], from: Int, until: Int, tRef: Double)
      : Array[Double] =
    Array.tabulate(NumBands) { b =>
      var s = 0.0
      var j = from
      while (j < until) {
        s += math.abs(y(b)(j) - models(b).predict(designRow(t(j), tRef)))
        j += 1
      }
      if (until > from) s / (until - from) else 0.0
    }

  private def toSegment(ts: PixelTimeseries, models: Array[BandFit],
      mags: Array[Double], tRef: Double, sday: Int, eday: Int, bday: Int,
      chprob: Double, curqa: Int): Segment = {
    def coef(b: Int): Array[Double] = {
      val beta = models(b).beta
      // coef = [slope, cos1, sin1, cos2, sin2, cos3, sin3]
      Array(beta(1), beta(2), beta(3), beta(4), beta(5), beta(6), beta(7))
    }
    // re-base the centered intercept to ordinal 0: the fit is
    // y = a + b*(t - tRef) + harmonics, the contract is int + slope*t
    def int(b: Int): Double = models(b).beta(0) - models(b).beta(1) * tRef
    Segment(
      ts.cx, ts.cy, ts.px, ts.py,
      dateOfOrdinal(sday), dateOfOrdinal(eday), dateOfOrdinal(bday),
      chprob, curqa,
      coef(0), int(0), mags(0), models(0).rmse,
      coef(1), int(1), mags(1), models(1).rmse,
      coef(2), int(2), mags(2), models(2).rmse,
      coef(3), int(3), mags(3), models(3).rmse,
      coef(4), int(4), mags(4), models(4).rmse,
      coef(5), int(5), mags(5), models(5).rmse,
      coef(6), int(6), mags(6), models(6).rmse)
  }
}

object HarmonicCcd {
  private[ops] val NumBands = 7
  private[ops] val Terms = 8 // intercept + slope + 3 harmonic pairs

  /** CCDC's adaptive model complexity: more observations unlock more
    * harmonic pairs (12->4 terms, 24->6, 33->8), which keeps a short
    * window from overfitting and extrapolating spurious breaks. */
  private[ops] def termsFor(nObs: Int): Int =
    if (nObs >= 33) 8 else if (nObs >= 24) 6 else 4
  private val W = 2.0 * math.Pi / 365.25
  /** Python date(1970,1,1).toordinal() */
  private val EpochOrdinal = 719163L

  private[ops] def dateOfOrdinal(ordinal: Int): Date =
    Date.valueOf(LocalDate.ofEpochDay(ordinal - EpochOrdinal))

  /** Design row with the linear term centered at tRef (conditioning);
    * harmonics keep the absolute phase (raw ti). */
  private[ops] def designRow(ti: Double, tRef: Double): Array[Double] = {
    val r = new Array[Double](Terms)
    r(0) = 1.0
    r(1) = ti - tRef
    var h = 1
    while (h <= 3) {
      r(2 * h) = math.cos(W * h * ti)
      r(2 * h + 1) = math.sin(W * h * ti)
      h += 1
    }
    r
  }

  private[ops] final case class BandFit(beta: Array[Double], rmse: Double) {
    def predict(row: Array[Double]): Double = {
      var s = 0.0
      var k = 0
      while (k < Terms) { s += beta(k) * row(k); k += 1 }
      s
    }
  }

  /** Incremental normal equations: X'X, X'y, y'y rank-1 updates;
    * SSE = y'y - 2 b·X'y + b·X'X·b recovered without a second pass. */
  private[ops] final class RunningFit {
    private val xtx = Array.ofDim[Double](Terms, Terms)
    private val xty = new Array[Double](Terms)
    private var yty = 0.0
    private var n = 0

    def add(row: Array[Double], obs: Double): Unit = {
      var a = 0
      while (a < Terms) {
        xty(a) += row(a) * obs
        val ra = row(a)
        val xa = xtx(a)
        var b = 0
        while (b < Terms) { xa(b) += ra * row(b); b += 1 }
        a += 1
      }
      yty += obs * obs
      n += 1
    }

    /** Solve using only the leading `terms` columns (adaptive model
      * complexity); trailing coefficients stay 0. */
    def solve(terms: Int = Terms): BandFit = {
      val a = Array.tabulate(terms, terms)((i, j) => xtx(i)(j))
      val b = Array.tabulate(terms)(xty(_))
      var d = 0
      while (d < terms) { a(d)(d) += 1e-6 * (1.0 + a(d)(d) * 1e-12); d += 1 }
      val solved = gauss(a, b)
      val beta = new Array[Double](Terms)
      System.arraycopy(solved, 0, beta, 0, terms)
      var sse = yty
      var k = 0
      while (k < Terms) {
        sse -= 2.0 * beta(k) * xty(k)
        var l = 0
        while (l < Terms) { sse += beta(k) * xtx(k)(l) * beta(l); l += 1 }
        k += 1
      }
      BandFit(beta, math.sqrt(math.max(0.0, sse) / math.max(1, n)))
    }
  }

  /** Gaussian elimination with partial pivoting. */
  private def gauss(m: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val n = v.length
    var col = 0
    while (col < n) {
      var p = col
      var r = col + 1
      while (r < n) {
        if (math.abs(m(r)(col)) > math.abs(m(p)(col))) p = r
        r += 1
      }
      val tr = m(col); m(col) = m(p); m(p) = tr
      val tv = v(col); v(col) = v(p); v(p) = tv
      val pv = m(col)(col)
      if (math.abs(pv) > 1e-300) {
        r = 0
        while (r < n) {
          if (r != col) {
            val f = m(r)(col) / pv
            var c = 0
            while (c < n) { m(r)(c) -= f * m(col)(c); c += 1 }
            v(r) -= f * v(col)
          }
          r += 1
        }
      }
      col += 1
    }
    Array.tabulate(n)(i =>
      if (math.abs(m(i)(i)) > 1e-300) v(i) / m(i)(i) else 0.0)
  }
}
