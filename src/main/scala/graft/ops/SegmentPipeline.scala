package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.store.Store

/** The /segment job (SURVEY.md §3.1): ARD chip scan → per-pixel CCD →
  * 37-col projection → chip/pixel/segment sinks.
  *
  * Spark shape: `read ARD → [limit] → mapPartitions(ccd) → selects →
  * overwrite-write`. Chip-parallelism is the partitioning (one task
  * works one chip's pixels when the source is partitioned by (cx, cy));
  * pixel-parallelism inside a chip comes free because rows are pixels.
  * The reference's multiprocessing.Pool (segment.py:189-195) maps to
  * Spark tasks; its empty-scan guard (F3) and limit (L1) are preserved.
  */
object SegmentPipeline {

  /** M1: per-pixel change detection as a typed partition map — the
    * canonical per-key heavy UDF placement (SURVEY §2.12: NOT an
    * Expression; too heavy for codegen, perfect for mapPartitions). */
  def detect(ts: Dataset[PixelTimeseries], detector: ChangeDetector)
      : Dataset[PixelDetection] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[PixelDetection]
    ts.mapPartitions(_.map(detector.detect))
  }

  /** Full job for one (or many) chips.
    *
    * @param limit    optional pixel cap (L1, ref segment.py:195 `take`)
    * @param acquired optional "YYYY/YYYY" observation window — the
    *                 reference's acquired request param, applied at the
    *                 scan by its upstream (segment.py:146-175)
    */
  def run(spark: SparkSession, ard: Dataset[PixelTimeseries], store: Store,
      detector: ChangeDetector = HarmonicCcd(), limit: Option[Int] = None,
      acquired: Option[String] = None): SegmentResult = {
    import spark.implicits._
    implicit val tsEnc = org.apache.spark.sql.Encoders.product[PixelTimeseries]

    val windowed = acquired.map { a =>
      val (from, to) = AcquiredWindow.parse(a)
      ard.map(AcquiredWindow.clip(_, from, to))
    }.getOrElse(ard)
    val capped = limit.map(windowed.limit).getOrElse(windowed)

    val detections = detect(capped, detector).cache()

    // S9: segment sink — explode per-pixel segment lists to rows
    val segments = detections.flatMap(_.segments)

    // S8: pixel sink — one mask record per pixel
    val pixels = detections
      .map(d => PixelRecord(d.cx, d.cy, d.px, d.py, d.mask))

    // S7: chip sink — groupBy(cx,cy).agg(first(dates)) (A3)
    val chips = detections
      .map(d => (d.cx, d.cy,
        d.dates.map(o => HarmonicCcd.dateOfOrdinal(o))))
      .toDF("cx", "cy", "dates")
      .groupBy($"cx", $"cy")
      .agg(first($"dates").as("dates"))
      .as[ChipRecord]

    // Counts FIRST, as ONE aggregate action over the cache: it forces
    // detection, so a detector failure surfaces before any sink is
    // touched — the nothing-persisted half of the reference's error
    // contract (ref: test/test_A_segment.py:159-194) — and a single
    // pass yields all three sink counts (at tile scale, 3 counting
    // passes per chip would triple the read volume). The same action
    // doubles as the F3 nodata guard (ref segment.py:178-184): zero
    // pixels means the scan was empty. The writes then stream from the
    // cache; JobQueue compensates if a write itself fails.
    // try/finally: the nodata throw, a detector failure surfacing in
    // the count, or a failed write must all still release the cache —
    // a long-running JobQueue answering repeated failing requests
    // would otherwise accumulate CacheManager entries until executor
    // storage memory is gone
    try {
      val c = detections
        .toDF()
        .agg(countDistinct(struct($"cx", $"cy")).as("chips"),
          count(lit(1)).as("pixels"),
          sum(size($"segments")).cast("long").as("segs"))
        .head()
      if (c.getLong(1) == 0L)
        throw new IllegalStateException("No timeseries data available")
      val counts = SegmentResult(
        chips = c.getLong(0), pixels = c.getLong(1), segments = c.getLong(2))
      store.write("segment", segments.toDF(), Seq("cx", "cy"))
      store.write("pixel", pixels.toDF(), Seq("cx", "cy"))
      store.write("chip", chips.toDF(), Seq("cx", "cy"))
      counts
    } finally detections.unpersist()
  }
}

final case class SegmentResult(chips: Long, pixels: Long, segments: Long)
