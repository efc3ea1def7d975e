package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TileModel
import graft.ml.Classifier
import graft.store.Store

/** The /tile job (SURVEY.md §3.2): segments ⋈ aux → filters → features →
  * statistics → stratified sample → split → train → persist model.
  *
  * Spark shape replaces the reference's per-chip process-Pool fan-out
  * (G2, tile.py:172-188) with one declarative plan over all chips: the
  * chip-parallelism IS the partitioning. Only two shuffles total: the
  * segments⋈aux join key and the stratified-sample window on label.
  */
object TrainingPipeline {

  final case class Params(
      date: String,
      targetSamples: Long = 20000000L,
      classMin: Long = 600000L,
      classMax: Long = 8000000L,
      testFraction: Double = 0.2,
      seed: Long = 42)

  /** Assemble the training matrix: J1 + F1 + F2 + C1/C4 + P2/P3.
    * Default segments carry empty coef arrays and are excluded by the
    * interval filter (their sday=eday=0001-01-01 can't contain a real
    * training date) — the ragged-row lesson baked into the plan. */
  def trainingData(segments: DataFrame, aux: DataFrame, date: String,
      broadcastAux: Boolean = true): DataFrame = {
    val joined = Features.combine(
      Features.segmentsFilter(segments, date),
      Features.auxFilter(aux), broadcastAux)
    Features.withAverageReflectance(joined, lit(date).cast("date"))
      .select(Features.label.as("label"),
        Features.independentArray.cast("array<float>").as("features"))
  }

  /** Full job: returns the model row and per-class statistics. */
  def run(spark: SparkSession, segments: DataFrame, aux: DataFrame,
      store: Store, classifier: Classifier, tx: Long, ty: Long,
      params: Params): TrainResult = {
    import spark.implicits._

    val data = trainingData(segments, aux, params.date).cache()
    try {
      val stats = Features.statistics(data).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))

      val sampled = Features.stratifiedSample(data, params.targetSamples,
        params.classMin, params.classMax, params.seed)

      // L2+L3: seeded randomize + train/test split (tile.py:215-239)
      val Array(trainDf, testDf) = sampled.randomSplit(
        Array(1.0 - params.testFraction, params.testFraction), params.seed)

      // M2: single-node train on the bounded collected sample — the one
      // sanctioned driver collect (sample ≤ 20M x 69 float32, SURVEY §7.4.5)
      val trainRows = trainDf.as[(Int, Array[Float])].collect()
      val modelBytes = classifier.train(trainRows)

      val model = Seq(TileModel(tx, ty, modelBytes)).toDF()
      store.write("tile", model, Seq("tx", "ty"))
      TrainResult(modelBytes, stats, trainRows.length, testDf.count())
    } finally data.unpersist()
  }
}

final case class TrainResult(
    model: Array[Byte],
    statistics: Array[(Int, Long, Double)],
    trainRows: Long,
    testRows: Long)
