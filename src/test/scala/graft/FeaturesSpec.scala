package graft

import java.sql.Date
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{AuxRow, Segment}
import graft.ops.{Features, TrainingPipeline}

/** The 69-value training-row contract (FIXTURES.md §5, ref
  * blackmagic/segaux.py:248-275): label first, then aspect..dem, then
  * per band in bl, gr, ni, re, s1, s2, th order (nir BEFORE red):
  * coef x7, rmse, ar. Every value here is distinct so any ordering slip
  * fails loudly.
  */
class FeaturesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("independent vector is exactly the 68-value contract order") {
    def coefs(base: Double): Array[Double] =
      Array.tabulate(7)(i => base + i) // base..base+6
    val seg = Segment(
      1L, 2L, 3L, 4L,
      Date.valueOf("1989-01-01"), Date.valueOf("1991-12-31"),
      Date.valueOf("1991-12-31"), 0.5, 0,
      // fields in SEGMENT order (bl, gr, ni, re, s1, s2, th)
      coefs(100), 1000, 0.1, 10,
      coefs(200), 2000, 0.2, 20,
      coefs(300), 3000, 0.3, 30,
      coefs(400), 4000, 0.4, 40,
      coefs(500), 5000, 0.5, 50,
      coefs(600), 6000, 0.6, 60,
      coefs(700), 7000, 0.7, 70)
    val aux = AuxRow(1L, 2L, 3L, 4L,
      Array(9), Array(101), Array(102.0), Array(103.0), Array(104),
      Array(105.0))

    val date = "1990-07-01"
    val df = TrainingPipeline.trainingData(
      spark.createDataset(Seq(seg)).toDF(),
      spark.createDataset(Seq(aux)).toDF(), date)
    val row = df.as[(Int, Array[Float])].head()

    assert(row._1 == 9) // label = nlcdtrn
    // ordinal of 1990-07-01 (Python toordinal)
    val ord = java.time.LocalDate.parse(date).toEpochDay + 719163L
    def ar(int: Double, c0: Double): Float = (int + c0 * ord).toFloat
    val expected: Array[Float] =
      Array(101f, 102f, 103f, 104f, 105f) ++
        Seq((100d, 1000d, 10d), (200d, 2000d, 20d), (300d, 3000d, 30d),
          (400d, 4000d, 40d), (500d, 5000d, 50d), (600d, 6000d, 60d),
          (700d, 7000d, 70d)).flatMap { case (cBase, int, rmse) =>
          (0 until 7).map(i => (cBase + i).toFloat) ++
            Seq(rmse.toFloat, ar(int, cBase))
        }
    assert(row._2.length == 68)
    assert(row._2.toSeq == expected.toSeq)
  }

  test("interval filter excludes segments not covering the date " +
      "and default segments never qualify") {
    val in = Seq(
      ("1989-01-01", "1991-12-31", true), // covers 1990-07-01
      ("1991-01-01", "1993-12-31", false), // starts after
      ("0001-01-01", "0001-01-01", false)) // default sentinel
      .toDF("s", "e", "want")
      .selectExpr("CAST(s AS DATE) AS sday", "CAST(e AS DATE) AS eday",
        "want")
    val got = Features.segmentsFilter(in, "1990-07-01")
      .select($"want").as[Boolean].collect()
    assert(got.toSeq == Seq(true))
  }
}
