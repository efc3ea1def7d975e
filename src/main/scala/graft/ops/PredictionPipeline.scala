package graft.ops

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.StringToColumn
import graft.core.Prediction
import graft.functions.DateExprs
import graft.ml.Classifier
import graft.store.Store

/** The /prediction job (SURVEY.md §3.3): segments ⋈ aux → annual explode
  * (C3) → features → default/data split (G1) → broadcast-model batch
  * scoring (M3) → union with sentinel defaults (U1) → overwrite-write.
  *
  * M3 preserves the reference's hard-won lesson (970 s/chip with per-row
  * predict, blackmagic/blueprints/prediction.py:199-231): the model is a
  * broadcast variable scored over whole partitions via mapPartitions —
  * never a per-row UDF.
  */
object PredictionPipeline {

  // NOT private: Spark's generated deserializer must reach the ctor
  final case class ScoredRow(
      cx: Long, cy: Long, px: Long, py: Long,
      sday: Date, eday: Date, pday: Date, features: Array[Float])

  private implicit val scoredEnc: Encoder[ScoredRow] =
    Encoders.product[ScoredRow]
  private implicit val predEnc: Encoder[Prediction] =
    Encoders.product[Prediction]

  /** Feature rows exploded to one row per (segment, prediction year). */
  def predictionData(segments: DataFrame, aux: DataFrame,
      month: Int, day: Int, broadcastAux: Boolean = true): DataFrame = {
    val joined = Features.combine(segments, aux, broadcastAux)
      .withColumn("pday",
        DateExprs.predictionDates($"sday", $"eday", month, day))
    Features.withAverageReflectance(joined, $"pday")
      .withColumn("is_default",
        DateExprs.isDefaultSegment($"sday", $"eday"))
  }

  /** Rows per scoring call: big enough to amortize per-batch model cost
    * (a chip is 30k rows — one or two batches, matching the reference's
    * one-DMatrix-per-chip shape), small enough to bound task memory even
    * when an eager backend materializes the batch. */
  private val ScoreBatchSize = 32768

  /** Score + persist; returns the number of prediction rows written. */
  def run(spark: SparkSession, segments: DataFrame, aux: DataFrame,
      store: Store, classifier: Classifier, modelBytes: Array[Byte],
      month: Int, day: Int): Long = {
    val data = predictionData(segments, aux, month, day)

    // G1: route default segments out BEFORE matrix assembly (ragged-row
    // lesson, test/test_D_prediction.py:598-631); they get prob = []
    val defaults = data.filter($"is_default")
      .select($"cx", $"cy", $"px", $"py", $"sday", $"eday", $"pday")
      .withColumn("prob", array().cast("array<float>"))

    val scoredInput = data.filter(!$"is_default")
      .select($"cx", $"cy", $"px", $"py", $"sday", $"eday", $"pday",
        Features.independentArray.cast("array<float>").as("features"))
      .as[ScoredRow]

    // M3: broadcast model + whole-partition vectorized scoring
    val bcModel = spark.sparkContext.broadcast(modelBytes)
    val bcClassifier = spark.sparkContext.broadcast(classifier)
    val scored = scoredInput.mapPartitions { it =>
      it.grouped(ScoreBatchSize).flatMap { batch =>
        val probs = bcClassifier.value
          .scoreBatch(bcModel.value, batch.iterator.map(_.features))
        batch.iterator.zip(probs).map { case (r, p) =>
          Prediction(r.cx, r.cy, r.px, r.py, r.sday, r.eday, r.pday, p)
        }
      }
    }

    // U1: scored ∪ defaults. Cache spans the write and the count so the
    // job's row count never re-scans the whole prediction table (a
    // full-table read per request would not survive 100 TB).
    val predictions = scored.toDF().unionByName(defaults).cache()
    try {
      store.write("prediction", predictions, Seq("cx", "cy"))
      predictions.count()
    } finally predictions.unpersist()
  }
}
