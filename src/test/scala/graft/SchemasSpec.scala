package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.ops.AcquiredWindow

/** Schema round-trips (SURVEY §7.1 module 1) and the acquired-window
  * scan clip (S1 parameter fidelity). */
class SchemasSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("segment rows round-trip through JSON incl. the year-1 sentinel") {
    val rows = Seq(
      Segment.default(-2061585L, 1922805L, 1L, 2L),
      Segment.default(0L, 0L, 3L, 4L).copy(
        sday = java.sql.Date.valueOf("1985-07-01"),
        blcoef = Array(0.1, 1, 2, 3, 4, 5, 6), blint = 42.5))
    val ds = spark.createDataset(rows)
    val json = ds.toDF().select(to_json(struct(ds.columns.map(col): _*))
      .as("j"))
    val back = json
      .select(from_json($"j", ds.schema).as("s")).select($"s.*")
      .as[Segment].collect().sortBy(r => (r.px, r.py))
    assert(back.length == 2)
    assert(back(0).sday.toString == "0001-01-01")
    assert(back(0).blcoef.isEmpty)
    assert(back(1).sday.toString == "1985-07-01")
    assert(back(1).blcoef.toSeq == Seq(0.1, 1, 2, 3, 4, 5, 6))
    assert(back(1).blint == 42.5)
  }

  test("prediction rows round-trip through parquet with empty prob") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pred").toString
    val rows = Seq(
      Prediction(1, 2, 3, 4, java.sql.Date.valueOf("0001-01-01"),
        java.sql.Date.valueOf("0001-01-01"),
        java.sql.Date.valueOf("0001-01-01"), Array.empty),
      Prediction(1, 2, 3, 4, java.sql.Date.valueOf("1985-07-01"),
        java.sql.Date.valueOf("1990-07-01"),
        java.sql.Date.valueOf("1986-07-01"), Array(0.25f, 0.75f)))
    spark.createDataset(rows).write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).as[Prediction].collect()
      .sortBy(_.prob.length)
    assert(back(0).prob.isEmpty && back(0).pday.toString == "0001-01-01")
    assert(back(1).prob.toSeq == Seq(0.25f, 0.75f))
  }

  test("acquired window clips all parallel arrays consistently") {
    val fx = new PipelineFixtures(spark)
    val ts = fx.chip().head
    val (from, to) = AcquiredWindow.parse("1990/1999")
    val clipped = AcquiredWindow.clip(ts, from, to)
    assert(clipped.dates.nonEmpty)
    assert(clipped.dates.length < ts.dates.length)
    assert(clipped.dates.forall(d => d >= from && d <= to))
    assert(clipped.blues.length == clipped.dates.length)
    assert(clipped.qas.length == clipped.dates.length)
    // values stay aligned: the first kept observation equals the source
    // at the first in-window index
    val firstIdx = ts.dates.indexWhere(_ >= from)
    assert(clipped.blues(0) == ts.blues(firstIdx))
  }
}
