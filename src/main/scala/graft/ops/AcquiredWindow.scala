package graft.ops

import graft.core.PixelTimeseries

/** The reference's `acquired` request parameter: the upstream scan only
  * returns observations inside the acquired ISO interval (merlin query,
  * ref blackmagic/blueprints/segment.py:146-175 — "1980/2019" in
  * tests). Our scan equivalent clips the per-pixel observation arrays
  * to the ordinal window before detection, so CCD sees exactly the
  * window the reference's upstream would deliver.
  */
object AcquiredWindow {

  /** Keep only observations with fromOrd <= date <= toOrd (ordinals).
    * All parallel arrays are clipped consistently. */
  def clip(ts: PixelTimeseries, fromOrd: Int, toOrd: Int): PixelTimeseries = {
    val keep = ts.dates.indices
      .filter(i => ts.dates(i) >= fromOrd && ts.dates(i) <= toOrd).toArray
    def pick(a: Array[Int]): Array[Int] = keep.map(a)
    PixelTimeseries(ts.cx, ts.cy, ts.px, ts.py,
      pick(ts.dates), pick(ts.blues), pick(ts.greens), pick(ts.reds),
      pick(ts.nirs), pick(ts.swir1s), pick(ts.swir2s), pick(ts.thermals),
      pick(ts.qas))
  }

  /** Parse the reference's "YYYY/YYYY" acquired string to an ordinal
    * window [Jan 1 of start year, Dec 31 of end year]. */
  def parse(acquired: String): (Int, Int) = {
    val Array(a, b) = acquired.split("/")
    def ord(d: java.time.LocalDate): Int = (d.toEpochDay + 719163L).toInt
    (ord(java.time.LocalDate.of(a.toInt, 1, 1)),
      ord(java.time.LocalDate.of(b.toInt, 12, 31)))
  }
}
