package graft.core

import java.sql.Date

/** Canonical record schemas (SURVEY.md §1.4, FIXTURES.md).
  *
  * Dates use java.sql.Date (Spark DateType, proleptic Gregorian) so the
  * reference's `0001-01-01` default-segment sentinel round-trips exactly
  * (ref: blackmagic/blueprints/segment.py:52-70).
  */
object Sentinel {
  /** ordinal 1 = Python date.fromordinal(1) */
  val Day1: Date = Date.valueOf("0001-01-01")
}

/** One pixel's full ARD time series — the merlin/chipmunk scan shape
  * (ref: blackmagic/blueprints/segment.py:107-116; FIXTURES.md §2).
  * 10,000 rows per 100x100 chip; arrays are per-observation.
  */
case class PixelTimeseries(
    cx: Long, cy: Long, px: Long, py: Long,
    dates: Array[Int],
    blues: Array[Int], greens: Array[Int], reds: Array[Int],
    nirs: Array[Int], swir1s: Array[Int], swir2s: Array[Int],
    thermals: Array[Int], qas: Array[Int])

/** CCD change-segment record, 37-field storage whitelist
  * (ref: blackmagic/data/ceph.py:178-217; defaults from
  * blackmagic/blueprints/segment.py:61-104: empty coefs, 0.0 metrics,
  * ordinal-1 dates).
  */
case class Segment(
    cx: Long, cy: Long, px: Long, py: Long,
    sday: Date, eday: Date, bday: Date,
    chprob: Double, curqa: Int,
    blcoef: Array[Double], blint: Double, blmag: Double, blrmse: Double,
    grcoef: Array[Double], grint: Double, grmag: Double, grrmse: Double,
    nicoef: Array[Double], niint: Double, nimag: Double, nirmse: Double,
    recoef: Array[Double], reint: Double, remag: Double, rermse: Double,
    s1coef: Array[Double], s1int: Double, s1mag: Double, s1rmse: Double,
    s2coef: Array[Double], s2int: Double, s2mag: Double, s2rmse: Double,
    thcoef: Array[Double], thint: Double, thmag: Double, thrmse: Double)

object Segment {
  /** Band keys in segment-field order; note training order differs
    * (bl, gr, ni, re, s1, s2, th — FIXTURES.md §5). */
  val bands: Seq[String] = Seq("bl", "gr", "ni", "re", "s1", "s2", "th")

  /** Default ("no model fit") segment — the sentinel row downstream
    * grouping (F4/G1/U1) depends on. */
  def default(cx: Long, cy: Long, px: Long, py: Long): Segment = Segment(
    cx, cy, px, py,
    Sentinel.Day1, Sentinel.Day1, Sentinel.Day1,
    chprob = 0.0, curqa = 0,
    Array.empty, 0.0, 0.0, 0.0, Array.empty, 0.0, 0.0, 0.0,
    Array.empty, 0.0, 0.0, 0.0, Array.empty, 0.0, 0.0, 0.0,
    Array.empty, 0.0, 0.0, 0.0, Array.empty, 0.0, 0.0, 0.0,
    Array.empty, 0.0, 0.0, 0.0)
}

/** Chip provenance record: observation dates, one row per chip
  * (ref: blackmagic/data/ceph.py:150-161). */
case class ChipRecord(cx: Long, cy: Long, dates: Array[Date])

/** Per-pixel QA/processing mask (ref: blackmagic/data/ceph.py:163-176). */
case class PixelRecord(cx: Long, cy: Long, px: Long, py: Long,
    mask: Array[Int])

/** Per-pixel detection result: the segment rows plus the chip-level
  * extras the reference carries on each row then splits off
  * (ref: blackmagic/blueprints/segment.py:101-102). */
case class PixelDetection(
    cx: Long, cy: Long, px: Long, py: Long,
    dates: Array[Int], mask: Array[Int], segments: Seq[Segment])

/** NLCD/DEM auxiliary raster values, one row per pixel; 1-element arrays
  * mirror the chipmunk-aux shape (ref: blackmagic/segaux.py:248-254,
  * test/test_C_segaux.py:477-483). nlcdtrn(0)==0 means unlabeled.
  */
case class AuxRow(
    cx: Long, cy: Long, px: Long, py: Long,
    nlcdtrn: Array[Int], aspect: Array[Int], posidex: Array[Double],
    slope: Array[Double], mpw: Array[Int], dem: Array[Double])

/** Per-pixel-per-year class-probability record
  * (ref: blackmagic/data/ceph.py:225-247). prob is empty for default
  * segments (U1 union semantics). */
case class Prediction(
    cx: Long, cy: Long, px: Long, py: Long,
    sday: Date, eday: Date, pday: Date, prob: Array[Float])

/** Trained tile classifier (ref: blackmagic/data/ceph.py:137-148); kept
  * as BinaryType end-to-end instead of the reference's hex codec (C6). */
case class TileModel(tx: Long, ty: Long, model: Array[Byte])
