package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{BoostConfig, GradientBoostedClassifier}
import graft.ops.{HarmonicCcd, SegmentPipeline, SyntheticTile}
import graft.store.ParquetStore
import graft.streaming.{JobQueue, JobRequest}

/** Multi-chip tile lifecycle (the reference's own suite ordering:
  * A segment -> B tile -> D prediction, test/test_B_tile.py:51-54)
  * driven through the job queue over a chip GRID, with the per-chip
  * partition economy asserted in the plans: detection never shuffles
  * across chips, and keyed read-back prunes to one chip partition no
  * matter how many chips the store holds. The 25-chip wall-time twin
  * of this spec runs in Bench as t1_tile_lifecycle.
  */
class TileLifecycleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val NChips = 9
  private val Side = 6
  private val Obs = 80

  test("chip-grid lifecycle: detection shuffle-free, keyed reads " +
    "prune to one chip, all stages green through the queue") {
    implicit val reqEnc = org.apache.spark.sql.Encoders.product[JobRequest]
    val root = Files.createTempDirectory("graft-tile-life").toString
    val store = new ParquetStore(root)
    val jq = new JobQueue(spark, store,
      ardSource = (cx, cy) => SyntheticTile.chip(spark, cx, cy, Side, Obs),
      auxSource = () => SyntheticTile.aux(spark, NChips, Side),
      classifier = new GradientBoostedClassifier(
        BoostConfig(numRound = 10, numClass = 4, maxDepth = 3)))

    // the detection stage maps over the source's own partitioning —
    // the chip-parallelism IS the partitioning, so there is no
    // cross-chip exchange anywhere in the per-pixel plan
    val det = SegmentPipeline.detect(
      SyntheticTile.chip(spark, SyntheticTile.cxOf(0), SyntheticTile.Cy,
        Side, Obs), HarmonicCcd())
    val detPlan = det.queryExecution.executedPlan.toString
    assert(!detPlan.contains("Exchange"), detPlan)

    // and the property is grid-size-independent: a MULTI-chip source
    // (the t2_tile_lifecycle_100 shape) detects with zero cross-chip
    // exchange too — chip parallelism rides the source partitioning,
    // so 4x/100x the chips never introduces a shuffle
    implicit val ptsEnc =
      org.apache.spark.sql.Encoders.product[graft.core.PixelTimeseries]
    val grid = spark.createDataset((0 until 4).flatMap(k =>
      SyntheticTile.chipRows(SyntheticTile.cxOf(k), SyntheticTile.Cy,
        Side, Obs)))
    val gridPlan = SegmentPipeline.detect(grid, HarmonicCcd())
      .queryExecution.executedPlan.toString
    assert(!gridPlan.contains("Exchange"), gridPlan)

    // A: one segment request per chip
    jq.dispatch(spark.createDataset((0 until NChips).map(k =>
      JobRequest("segment", SyntheticTile.cxOf(k), SyntheticTile.Cy,
        0, 0, "", 0, 0))))
    val seg = jq.results.filter(_.kind == "segment")
    assert(seg.length == NChips && seg.forall(_.ok),
      seg.filterNot(_.ok).toString)

    // the store holds NChips chip partitions; a keyed read prunes the
    // scan to ONE of them (S3 semantics at multi-chip scale)
    val one = store.read("segment", spark)
      .filter($"cx" === SyntheticTile.cxOf(3) && $"cy" === SyntheticTile.Cy)
    val onePlan = one.queryExecution.executedPlan.toString
    assert(onePlan.contains("PartitionFilters: [isnotnull(cx"), onePlan)
    assert(one.count() >= Side.toLong * Side)
    assert(store.read("segment", spark)
      .select($"cx").distinct().count() == NChips)

    // B: train one tile model over every chip's segments
    jq.dispatch(spark.createDataset(Seq(
      JobRequest("tile", 0, 0, 7, 9, "1987-07-01", 0, 0))))
    val tile = jq.results.find(_.kind == "tile").get
    assert(tile.ok, tile.error)
    assert(store.read("tile", spark)
      .filter($"tx" === 7 && $"ty" === 9).count() == 1)

    // D: one prediction request per chip against the persisted model
    jq.dispatch(spark.createDataset((0 until NChips).map(k =>
      JobRequest("prediction", SyntheticTile.cxOf(k), SyntheticTile.Cy,
        7, 9, "", 7, 1))))
    val pred = jq.results.filter(_.kind == "prediction")
    assert(pred.length == NChips && pred.forall(_.ok),
      pred.filterNot(_.ok).toString)
    // every chip produced predictions, keyed by its own partition
    assert(store.read("prediction", spark)
      .select($"cx").distinct().count() == NChips)
  }
}
