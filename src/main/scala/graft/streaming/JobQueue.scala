package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.PixelTimeseries
import graft.ml.Classifier
import graft.ops._
import graft.store.Store

/** One pipeline request — the streaming replacement for the reference's
  * three HTTP POST bodies (ref: blackmagic/blueprints/segment.py:146-163,
  * tile.py:149-170, prediction.py:245-281). `kind` selects the pipeline;
  * unused fields are ignored per kind.
  */
final case class JobRequest(
    kind: String, // segment | tile | prediction
    cx: Long, cy: Long, tx: Long, ty: Long,
    date: String, month: Int, day: Int)

/** The result record appended to the job log for each processed request. */
final case class JobResult(kind: String, cx: Long, cy: Long,
    tx: Long, ty: Long, ok: Boolean, rows: Long, error: String)

/** Job-queue stream driver (SURVEY §2.11 / §7.1 module 7): requests
  * arrive on any streaming source; `foreachBatch` dispatches the
  * corresponding batch pipeline. Exactly-once story: checkpointing
  * makes batch replay possible, and every sink is an idempotent keyed
  * overwrite (S12 semantics), so replays converge. The reference's
  * per-stage error channel (exception -> error response, nothing
  * persisted) maps to per-request try/catch emitting a JobResult.
  */
final class JobQueue(
    spark: SparkSession,
    store: Store,
    ardSource: (Long, Long) => Dataset[PixelTimeseries],
    auxSource: () => DataFrame,
    classifier: Classifier,
    detector: ChangeDetector = HarmonicCcd()) extends Serializable {

  @volatile private var log = List.empty[JobResult]
  def results: List[JobResult] = log

  /** Process one micro-batch of requests (also the unit test surface). */
  def dispatch(batch: Dataset[JobRequest]): Unit = {
    // request batches are tiny control messages (the reference's HTTP
    // bodies) — collecting them to the driver is the sanctioned pattern;
    // the DATA work each one triggers stays fully distributed.
    batch.collect().foreach { r =>
      val res =
        try {
          r.kind match {
            case "segment" =>
              val out = SegmentPipeline.run(spark, ardSource(r.cx, r.cy),
                store, detector)
              JobResult(r.kind, r.cx, r.cy, r.tx, r.ty, ok = true,
                out.segments, "")
            case "tile" =>
              val out = TrainingPipeline.run(spark,
                store.read("segment", spark), auxSource(), store,
                classifier, r.tx, r.ty,
                TrainingPipeline.Params(date = r.date,
                  targetSamples = 1000000, classMin = 1, classMax = 1000000))
              JobResult(r.kind, r.cx, r.cy, r.tx, r.ty, ok = true,
                out.trainRows, "")
            case "prediction" =>
              import org.apache.spark.sql.functions.col
              import spark.implicits._
              val modelBytes = store.read("tile", spark)
                .filter(col("tx") === r.tx && col("ty") === r.ty)
                .select(col("model")).as[Array[Byte]].head()
              val n = PredictionPipeline.run(spark,
                store.read("segment", spark)
                  .filter(col("cx") === r.cx && col("cy") === r.cy),
                auxSource(), store, classifier, modelBytes, r.month, r.day)
              JobResult(r.kind, r.cx, r.cy, r.tx, r.ty, ok = true, n, "")
            case other =>
              JobResult(other, r.cx, r.cy, r.tx, r.ty, ok = false, 0,
                s"unknown kind: $other")
          }
        } catch {
          case e: Exception =>
            JobResult(r.kind, r.cx, r.cy, r.tx, r.ty, ok = false, 0,
              String.valueOf(e.getMessage))
        }
      log = res :: log
    }
  }

  /** Start the streaming dispatcher over a request stream. */
  def start(requests: Dataset[JobRequest], checkpoint: String)
      : StreamingQuery =
    requests.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: Dataset[JobRequest], _: Long) =>
        dispatch(batch)
      }
      .start()
}
