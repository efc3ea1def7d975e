package graft

import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import graft.core.{AuxRow, PixelTimeseries}

/** Shared synthetic 5x5-pixel chip + aux fixtures for pipeline and
  * streaming specs (deterministic; mirrors the reference's test chip
  * coords, test/__init__.py:17-20).
  */
class PipelineFixtures(spark: SparkSession) {
  val Cx = -2061585L
  val Cy = 1922805L
  val Side = 5

  def ordinal(iso: String): Int =
    (LocalDate.parse(iso).toEpochDay + 719163L).toInt

  def chip(): Seq[PixelTimeseries] = {
    val t0 = ordinal("1985-01-03")
    val n = 230
    val dates = Array.tabulate(n)(i => t0 + 16 * i)
    for (px <- 0 until Side; py <- 0 until Side) yield {
      val shift = px * 10 + py
      def band(base: Double, amp: Double): Array[Int] =
        Array.tabulate(n) { i =>
          val t = dates(i).toDouble
          (base + shift + amp * math.sin(2 * math.Pi * t / 365.25) +
            ((i % 7) - 3) * 4.0).toInt
        }
      PixelTimeseries(Cx, Cy, Cx / 30 + px, Cy / 30 - py, dates,
        band(800, 120), band(900, 140), band(1000, 160), band(3000, 500),
        band(2000, 300), band(1500, 250), band(2800, 400),
        Array.fill(n)(0))
    }
  }

  def aux(): Seq[AuxRow] =
    (for (px <- 0 until Side; py <- 0 until Side) yield {
      val label = (px + py) % 3 + 1 // classes 1..3
      val nl = if (px == 0 && py == 0) 0 else label // one unlabeled pixel
      AuxRow(Cx, Cy, Cx / 30 + px, Cy / 30 - py,
        Array(nl), Array(px * 10), Array(py * 0.5), Array(1.5),
        Array(px), Array(340.0 + py))
    })
}
