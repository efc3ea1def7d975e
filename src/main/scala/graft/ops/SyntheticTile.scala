package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import graft.core.{AuxRow, PixelTimeseries}

/** Deterministic multi-chip tile generator, in main scope so the
  * tile-lifecycle spec and the bench share one fixture. The reference's
  * unit of work is a 2,500-chip tile processed chip by chip (ref:
  * blackmagic/data/ceph.py:39, test/test_B_tile.py:51-54); this builds
  * a scaled chip GRID — side×side-pixel chips on 3 km centers, each
  * pixel a harmonic reflectance series — so multi-chip runs exercise
  * the same per-chip partition economy at spec/bench-sized counts.
  */
object SyntheticTile {

  val Cx0 = -2061585L
  val Cy = 1922805L
  /** 100 px × 30 m: one reference chip edge. */
  val ChipMeters = 3000L

  def cxOf(k: Int): Long = Cx0 + k * ChipMeters

  def ordinal(iso: String): Int =
    (java.time.LocalDate.parse(iso).toEpochDay + 719163L).toInt

  /** One chip's pixel series (same shape as the spec fixtures:
    * seasonal harmonic + per-pixel shift + deterministic noise). */
  def chipRows(cx: Long, cy: Long = Cy, side: Int = 10,
      n: Int = 120): Seq[PixelTimeseries] = {
    val t0 = ordinal("1985-01-03")
    val dates = Array.tabulate(n)(i => t0 + 16 * i)
    for (px <- 0 until side; py <- 0 until side) yield {
      val shift = (px * 10 + py) % 97
      def band(base: Double, amp: Double): Array[Int] =
        Array.tabulate(n) { i =>
          val t = dates(i).toDouble
          (base + shift + amp * math.sin(2 * math.Pi * t / 365.25) +
            ((i % 7) - 3) * 4.0).toInt
        }
      PixelTimeseries(cx, cy, cx / 30 + px, cy / 30 - py, dates,
        band(800, 120), band(900, 140), band(1000, 160), band(3000, 500),
        band(2000, 300), band(1500, 250), band(2800, 400),
        Array.fill(n)(0))
    }
  }

  /** Partition a driver-local fixture to its DATA, not the core count:
    * `createDataset(Seq)` plans a LocalTableScan whose RDD fans out to
    * `min(rows, leafNodeDefaultParallelism)` slices — for a 100-pixel
    * bench chip on local[32] that is 32 partitions of ~3 rows, so every
    * per-chip lifecycle stage schedules ~32 near-empty tasks and a
    * 100-chip grid pays tens of thousands of them (measured: the t2
    * segment stage is task-overhead-bound, guide §2.2/§2.5 — partition
    * count must derive from input size). One slice per ~500 pixels,
    * capped at the session's default parallelism, keeps a real 10k-pixel
    * chip at ~20 parallel tasks while a bench chip becomes one. */
  private def slicesFor(s: SparkSession, rows: Int, rowsPerSlice: Int): Int =
    math.max(1, math.min(s.sparkContext.defaultParallelism,
      (rows + rowsPerSlice - 1) / rowsPerSlice))

  def chip(s: SparkSession, cx: Long, cy: Long = Cy, side: Int = 10,
      n: Int = 120): Dataset[PixelTimeseries] = {
    implicit val enc = Encoders.product[PixelTimeseries]
    val rows = chipRows(cx, cy, side, n)
    s.createDataset(
      s.sparkContext.parallelize(rows, slicesFor(s, rows.size, 500)))
  }

  /** Aux labels for a chip grid: classes 1..3 by pixel position, one
    * unlabeled pixel per chip (the F1 filter case). */
  def aux(s: SparkSession, nChips: Int, side: Int = 10): DataFrame = {
    implicit val enc = Encoders.product[AuxRow]
    auxDs(s, for {
      k <- 0 until nChips
      cx = cxOf(k)
      px <- 0 until side; py <- 0 until side
    } yield {
      val label = (px + py) % 3 + 1
      val nl = if (px == 0 && py == 0) 0 else label
      AuxRow(cx, Cy, cx / 30 + px, Cy / 30 - py,
        Array(nl), Array(px * 10), Array(py * 0.5), Array(1.5),
        Array(px), Array(340.0 + py))
    }).toDF()
  }

  /** Same data-sized slicing for the aux fixture (it is cached once per
    * dispatch batch, then re-scanned per chip for the broadcast slice —
    * 32 cached partitions of a few hundred rows made every per-chip
    * broadcast build a 32-task job). ~2500 rows per slice. */
  private def auxDs(s: SparkSession, rows: Seq[AuxRow])(
      implicit enc: org.apache.spark.sql.Encoder[AuxRow])
      : Dataset[AuxRow] =
    s.createDataset(
      s.sparkContext.parallelize(rows, slicesFor(s, rows.size, 2500)))
}
