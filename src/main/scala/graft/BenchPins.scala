package graft

/** The bench record's machine-checked performance pins as PURE logic,
  * factored out of [[Bench]] so a unit spec can replay past official
  * records through it (the r12 lesson: the lifecycle pin's 2.0 bar was
  * designed after r11's 4.76x artifact and the very first official
  * record it guarded slipped a ~2.6x t2-segment artifact under it at
  * ratio 1.98 — a pin whose calibration is only exercised by live
  * weather is a pin that is never tested).
  *
  * Calibration data (official + probe records, r11-r12):
  *  - clean t2/t1 per-chip stage ratios read 0.60-1.15 (t1's fixed
  *    overhead amortizes over fewer chips, so t2/t1 < 1 is the healthy
  *    shape); the high bar sits at 1.5 — 30% above the observed clean
  *    max — where the old 2.0 left 74% headroom for exactly the
  *    double-corrupted-sample mode that slipped under it.
  *  - the BENCH_r12 artifact: t2 segment runs 94.3/73.6 s vs t1 9.27 s
  *    (ratio 1.98, both samples corrupted), t2 prediction runs
  *    74.3/24.4 vs t1 3.44 (ratio 1.77). Both flag under the 1.5 bar
  *    AND under the both-runs check.
  *  - a t1-side corruption (r12 run D) read segment ratio 0.28; the
  *    low bar 0.5 catches that side (clean min 0.60).
  *  - the TILE stage is ONE training job at both grid sizes (the tile
  *    dispatch is a single JobRequest regardless of chips; only its
  *    training-sample size scales), so tile per-chip cost does NOT
  *    hold flat across grids — a per-chip tile ratio would read ~0.25
  *    x (t2tile/t1tile) and false-flag every clean record. The tile
  *    pin is therefore on the WALL ratio t2/t1 (clean ~1.0-1.5,
  *    r12 official 1.47 under mild weather), barred at [0.4, 2.5] —
  *    generous until more clean band data accumulates, but finite, so
  *    a tile-only weather artifact no longer passes unexamined (the
  *    r12 ADVICE gap).
  */
object BenchPins {

  /** (wall, segment, tile, prediction) seconds of one lifecycle run. */
  type Stages = (Double, Double, Double, Double)

  /** High/low bars on the t2/t1 per-chip ratio for the per-chip
    * stages (segment, prediction). */
  val RatioHigh = 1.5
  val RatioLow = 0.5

  /** Both-runs absolute check: if EVERY raw t2 run of a per-chip
    * stage exceeds this factor times t1's per-chip cost, the stage
    * block is flagged regardless of the min-based ratio — the
    * double-corrupted-sample mode where the min cannot save the
    * number. One-directional (t2 vs t1) by design: the healthy band
    * has t1 per-chip NATURALLY up to 1.67x t2's (ratio 0.60), so a
    * symmetric check would false-flag clean records. */
  val BothRunsFactor = 1.5

  /** Tile-stage WALL-ratio bars (see the header: tile is one job at
    * both grids, per-chip does not apply). */
  val TileWallHigh = 2.5
  val TileWallLow = 0.4

  /** Weather-ref elevation factor: a pinned query's violation is
    * stamped "weather" (not true) when any untouched same-class
    * reference query in the SAME record reads above this factor times
    * its pinned clean anchor — the r11-r12 pattern where the whole
    * heavy-text class shifts ~1.4-2.3x together under host pressure
    * both canaries miss. */
  val WeatherFactor = 1.3

  /** Pinned clean anchors for the weather reference queries — the
    * observed canary-clean maxima on this box across r10-r12 records
    * and probes (x75 2.77-3.33 s morning records; x43 2.37-3.02 s
    * r10/r11 records, ~4.2 s judge-probed clean on the r12 binary).
    * An anchor is a documented constant, not a moving average: the
    * refs' bodies are byte-stable across rounds precisely so their
    * level is attributable. */
  val RefAnchors: Seq[(String, Double)] = Seq(
    "x75_bm25_wand" -> 3.3,
    "x43_ann_ivfpq_trained" -> 4.3)

  /** Ref-run INSTABILITY gate: the level gate above has a hard 1.3
    * cliff, and the box's documented ~10-minute oscillation produces
    * windows where the refs' min lands just UNDER it (1.23-1.24x)
    * while their raw runs are still falling steeply through the
    * transition — the r13 23:28 record read x75 runs 5.87→4.50→4.06
    * (spread 1.45) and x43 7.97→5.71→5.34 (spread 1.49) and stamped an
    * unqualified true on a weather window. A ref whose own three runs
    * spread wider than this factor is measuring a NON-STATIONARY
    * window, and the verdict is weather regardless of where the min
    * landed. Calibration: stable windows (clean or uniformly hot —
    * the latter caught by the level gate) read ref spreads 1.06-1.16
    * across tonight's probes; mid-oscillation transitions read
    * 1.38-1.49. A genuine regression measured in a stable window
    * (tight in-band refs) still stamps true. */
  val RefSpreadFactor = 1.35

  def perChip(v: Double, chips: Int): Double =
    if (v > 0 && chips > 0) v / chips else -1.0

  /** The lifecycle stage cross-check over the min-of-runs stage
    * numbers AND the raw runs. Returns the ratios, the both-runs
    * attribution strings (which grid-stage carried the weather), and
    * the violated bit. */
  final case class LifecyclePin(segRatio: Double, tileWallRatio: Double,
      predRatio: Double, bothRuns: Seq[String], violated: Boolean) {
    def json: String =
      s"""{"bar_ratio":$RatioHigh,"bar_ratio_low":$RatioLow,""" +
        s""""tile_bar_wall":[$TileWallLow,$TileWallHigh],""" +
        s""""segment_per_chip_ratio":${f3(segRatio)},""" +
        s""""tile_wall_ratio":${f3(tileWallRatio)},""" +
        s""""prediction_per_chip_ratio":${f3(predRatio)},""" +
        s""""both_runs":[${bothRuns.map(q => "\"" + q + "\"")
          .mkString(",")}],""" +
        s""""violated":$violated}"""
  }

  def lifecyclePin(t1: Stages, t2: Stages, t2Runs: Seq[Stages],
      t1Chips: Int, t2Chips: Int): LifecyclePin = {
    def ratio(s1: Double, s2: Double): Double = {
      val (a, b) = (perChip(s1, t1Chips), perChip(s2, t2Chips))
      if (a > 0 && b > 0) b / a else -1.0
    }
    val segR = ratio(t1._2, t2._2)
    val predR = ratio(t1._4, t2._4)
    val tileR =
      if (t1._3 > 0 && t2._3 > 0) t2._3 / t1._3 else -1.0
    def off(r: Double): Boolean = r > RatioHigh || (r > 0 && r < RatioLow)
    val both = Seq[(String, Stages => Double)](
      "segment" -> (_._2), "prediction" -> (_._4)).flatMap {
      case (nm, f) =>
        val ref = perChip(f(t1), t1Chips)
        val runs = t2Runs.map(r => perChip(f(r), t2Chips)).filter(_ > 0)
        if (ref > 0 && runs.nonEmpty &&
            runs.forall(_ > BothRunsFactor * ref))
          Some(s"t2 $nm: all raw runs exceed ${BothRunsFactor}x " +
            "t1 per-chip")
        else None
    }
    val tileOff = tileR > TileWallHigh ||
      (tileR > 0 && tileR < TileWallLow)
    LifecyclePin(segR, tileR, predR, both,
      off(segR) || off(predR) || tileOff || both.nonEmpty)
  }

  /** A pinned query's violation verdict. `Weather` is DISTINCT from
    * `Violated`: the bar was exceeded but the record's own weather
    * refs read elevated, so the reading is the box, not the code —
    * two rounds of official records shipped unqualified
    * `violated: true` on pure box pressure, training readers to
    * ignore the pin. A genuine regression (refs in band) still
    * stamps true. */
  sealed trait Violation { def json: String; def fired: Boolean }
  case object Clean extends Violation {
    val json = "false"; val fired = false
  }
  case object Violated extends Violation {
    val json = "true"; val fired = true
  }
  case object Weather extends Violation {
    val json = "\"weather\""; val fired = true
  }

  /** Classify a pinned query's reading. `reprobeSec` is the min-of-3
    * re-probe Bench runs AFTER seeing warm > bar (negative = not run /
    * not needed); the best of warm and re-probe competes against the
    * bar, so one-shot noise spikes never stamp at all. `refs` are
    * (name, measuredSec, anchorSec); `refRuns`, when available (the
    * Record path), are each ref's raw runs — a spread beyond
    * [[RefSpreadFactor]] marks the window non-stationary and the
    * verdict weather even when the ref MIN slipped under the level
    * gate. */
  def classify(warmSec: Double, barSec: Double, enforced: Boolean,
      reprobeSec: Double, refs: Seq[(String, Double, Double)],
      refRuns: Seq[Seq[Double]] = Nil): Violation = {
    if (!enforced || warmSec < 0) return Clean
    val best =
      if (reprobeSec > 0) math.min(warmSec, reprobeSec) else warmSec
    if (best <= barSec) Clean
    else if (refs.exists { case (_, m, a) =>
        m > 0 && a > 0 && m > WeatherFactor * a }) Weather
    else if (refRuns.exists(rs =>
        rs.size >= 2 && rs.min > 0 && rs.max / rs.min > RefSpreadFactor))
      Weather
    else Violated
  }

  /** weather_refs JSON with the anchor and elevation bit beside each
    * measurement, so the stamp is readable without archaeology. */
  def refsJson(refs: Seq[(String, Double, Double)]): String =
    refs.map { case (n, m, a) =>
      val elev = m > 0 && a > 0 && m > WeatherFactor * a
      s""""$n":{"sec":${f3(m)},"anchor":$a,"elevated":$elev}"""
    }.mkString("{", ",", "}")

  /** 3-decimal rounding for the compact headline line (full precision
    * lives in the sidecar): the r11/r12 records were truncated
    * mid-stream by the driver's capture window, so every headline
    * byte counts. */
  def f3(v: Double): String =
    if (v < 0) v.toString
    else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      .toString
}
