package graft.ml

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

/** M2/M5: the multiclass land-cover classifier behind a pluggable trait
  * (SURVEY.md §7.3: "library behind Classifier trait"). The reference
  * trains XGBoost (9-class softprob) single-node on a bounded sample
  * (≤20M rows × 69 float32 ≈ 5.5 GB — blackmagic/__init__.py:17-19) and
  * serializes the booster to bytes (blackmagic/segaux.py:301-327).
  *
  * xgboost4j is not on this classpath, so the default implementation is
  * a deterministic multinomial-logistic (softmax) model trained on the
  * collected sample — same matrix contract (label + 68 float features),
  * same bytes-in/bytes-out model lifecycle, same batch-scoring surface.
  * Swapping in xgboost4j later is a one-class change.
  */
trait Classifier extends Serializable {
  /** Train on a driver-collected sample: rows of (label, features). The
    * collect is the one sanctioned bounded collect (SURVEY §7.4.5). */
  def train(rows: Array[(Int, Array[Float])]): Array[Byte]

  /** Batch scorer for M3: whole-partition vectorized predict against a
    * broadcast model — never per-row (the reference's 970 s/chip lesson,
    * blackmagic/blueprints/prediction.py:199-208). */
  def scoreBatch(model: Array[Byte],
      rows: Iterator[Array[Float]]): Iterator[Array[Float]]
}

/** Deterministic softmax regression with per-feature standardization
  * baked into the serialized model. numClasses mirrors the reference's
  * num_class=9 (blackmagic/__init__.py:21).
  */
final class SoftmaxClassifier(
    numClasses: Int = 9,
    epochs: Int = 60,
    learningRate: Double = 0.5) extends Classifier {

  override def train(rows: Array[(Int, Array[Float])]): Array[Byte] = {
    require(rows.nonEmpty, "empty training sample")
    // same loud guard as the GBT trainer: an out-of-range label would
    // otherwise contribute only push-everything-down gradients and
    // silently degrade the model
    require(rows.forall(r => r._1 >= 0 && r._1 < numClasses),
      s"labels must lie in [0, $numClasses) — found ${
        rows.iterator.map(_._1)
          .filterNot(l => l >= 0 && l < numClasses).next()}")
    val d = rows(0)._2.length
    val n = rows.length
    // standardization stats
    val mean = new Array[Double](d)
    val std = new Array[Double](d)
    rows.foreach { case (_, f) =>
      var j = 0; while (j < d) { mean(j) += f(j); j += 1 }
    }
    var j = 0; while (j < d) { mean(j) /= n; j += 1 }
    rows.foreach { case (_, f) =>
      var k = 0
      while (k < d) { val v = f(k) - mean(k); std(k) += v * v; k += 1 }
    }
    j = 0
    while (j < d) { std(j) = math.max(math.sqrt(std(j) / n), 1e-9); j += 1 }

    val x = rows.map { case (_, f) =>
      Array.tabulate(d)(k => (f(k) - mean(k)) / std(k))
    }
    val lab = rows.map(_._1)
    // weights: numClasses x (d+1), last column = bias
    val w = Array.ofDim[Double](numClasses, d + 1)
    val grad = Array.ofDim[Double](numClasses, d + 1)
    val logits = new Array[Double](numClasses)
    var e = 0
    while (e < epochs) {
      var c = 0
      while (c < numClasses) { java.util.Arrays.fill(grad(c), 0.0); c += 1 }
      var i = 0
      while (i < n) {
        val xi = x(i)
        softmaxLogits(w, xi, logits)
        c = 0
        while (c < numClasses) {
          val err = logits(c) - (if (lab(i) == c) 1.0 else 0.0)
          val gc = grad(c)
          var k = 0
          while (k < d) { gc(k) += err * xi(k); k += 1 }
          gc(d) += err
          c += 1
        }
        i += 1
      }
      val lr = learningRate / n
      c = 0
      while (c < numClasses) {
        var k = 0
        while (k <= d) { w(c)(k) -= lr * grad(c)(k); k += 1 }
        c += 1
      }
      e += 1
    }
    serialize(d, mean, std, w)
  }

  override def scoreBatch(model: Array[Byte],
      rows: Iterator[Array[Float]]): Iterator[Array[Float]] = {
    val (d, mean, std, w) = deserialize(model)
    val logits = new Array[Double](w.length)
    rows.map { f =>
      val xi = Array.tabulate(d)(k => (f(k) - mean(k)) / std(k))
      softmaxLogits(w, xi, logits)
      val out = new Array[Float](w.length)
      var c = 0
      while (c < w.length) { out(c) = logits(c).toFloat; c += 1 }
      out
    }
  }

  private def softmaxLogits(w: Array[Array[Double]], xi: Array[Double],
      out: Array[Double]): Unit = {
    val d = xi.length
    var c = 0
    var mx = Double.NegativeInfinity
    while (c < w.length) {
      val wc = w(c)
      var s = wc(d)
      var k = 0
      while (k < d) { s += wc(k) * xi(k); k += 1 }
      out(c) = s
      if (s > mx) mx = s
      c += 1
    }
    var z = 0.0
    c = 0
    while (c < w.length) { out(c) = math.exp(out(c) - mx); z += out(c); c += 1 }
    c = 0
    while (c < w.length) { out(c) /= z; c += 1 }
  }

  private def serialize(d: Int, mean: Array[Double], std: Array[Double],
      w: Array[Array[Double]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(w.length); out.writeInt(d)
    mean.foreach(out.writeDouble); std.foreach(out.writeDouble)
    w.foreach(_.foreach(out.writeDouble))
    out.flush()
    bos.toByteArray
  }

  private def deserialize(bytes: Array[Byte])
      : (Int, Array[Double], Array[Double], Array[Array[Double]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val classes = in.readInt(); val d = in.readInt()
    val mean = Array.fill(d)(in.readDouble())
    val std = Array.fill(d)(in.readDouble())
    val w = Array.fill(classes)(Array.fill(d + 1)(in.readDouble()))
    (d, mean, std, w)
  }
}
