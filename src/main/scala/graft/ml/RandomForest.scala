package graft.ml

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  ObjectInputStream, ObjectOutputStream}
import org.apache.spark.ml.classification.{RandomForestClassificationModel,
  RandomForestClassifier}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession

/** Tree-ensemble implementation of [[Classifier]] on Spark-ML
  * RandomForest — the SURVEY §7.3 fallback for the reference's XGBoost
  * (blackmagic/blueprints/tile.py:287-331: hist trees, depth 8,
  * 9-class softprob). Same matrix contract and bytes-in/bytes-out
  * model lifecycle as [[SoftmaxClassifier]]; swapping trainers is a
  * constructor choice, exactly the pluggability the trait promises.
  *
  * Training runs on the active session over the re-parallelized
  * bounded sample (the reference's single-node xgb.train on the same
  * ≤5.5 GB matrix, blackmagic/__init__.py:17-19). maxDepth mirrors the
  * reference's max_depth=8.
  *
  * Scoring keeps the M3 shape: the serialized model travels as bytes,
  * is revived once per scoring batch on the executor, and predicts
  * row-locally — no per-row UDF dispatch, no driver round-trip.
  *
  * Class-presence fixup (M4, references/xg-train-annualized.py:118-128):
  * rather than injecting fake rows for absent classes, the probability
  * vector is padded to `numClasses` on the scoring side — absent
  * classes score 0, present classes keep their tree votes.
  *
  * Persistence caveat: the model bytes are JDK object-serialization of
  * Spark-ML internals, so they are NOT stable across Spark/JVM
  * upgrades — fine for the in-session serving lifecycle, but durable
  * cross-version artifacts should use [[GradientBoostedClassifier]],
  * whose wire format is explicit and version-independent.
  */
final class RandomForestSparkClassifier(
    numClasses: Int = 9,
    numTrees: Int = 50,
    maxDepth: Int = 8,
    seed: Long = 42) extends Classifier {

  override def train(rows: Array[(Int, Array[Float])]): Array[Byte] = {
    require(rows.nonEmpty, "empty training sample")
    val spark = SparkSession.active
    import spark.implicits._
    val df = rows.toSeq
      .map { case (l, f) =>
        (l.toDouble, Vectors.dense(f.map(_.toDouble)))
      }
      .toDF("label", "features")
    val model = new RandomForestClassifier()
      .setNumTrees(numTrees)
      .setMaxDepth(maxDepth)
      .setSeed(seed)
      .setLabelCol("label")
      .setFeaturesCol("features")
      .fit(df)
    val bos = new ByteArrayOutputStream()
    val out = new ObjectOutputStream(bos)
    out.writeObject(model)
    out.close()
    bos.toByteArray
  }

  override def scoreBatch(model: Array[Byte],
      rows: Iterator[Array[Float]]): Iterator[Array[Float]] = {
    val in = new ObjectInputStream(new ByteArrayInputStream(model))
    val m = in.readObject().asInstanceOf[RandomForestClassificationModel]
    in.close()
    rows.map { f =>
      val p = m.predictProbability(Vectors.dense(f.map(_.toDouble)))
      // the M4 fixup is one-directional: a model trained with FEWER
      // classes than numClasses pads with zeros; a model that learned
      // MORE classes than this scorer emits must fail loudly —
      // truncating would drop real probability mass silently and make
      // the extra classes unpredictable
      require(p.size <= numClasses,
        s"model has ${p.size} classes > scorer width $numClasses")
      val out = new Array[Float](numClasses)
      var c = 0
      while (c < p.size) { out(c) = p(c).toFloat; c += 1 }
      out
    }
  }
}
