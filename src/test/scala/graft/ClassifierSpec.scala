package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Classifier, RandomForestSparkClassifier, SoftmaxClassifier}

/** The pluggable-trainer contract (M2/M3/M5): both implementations must
  * train from the same (label, features) matrix, round-trip the model
  * through bytes, and batch-score to class-probability vectors — the
  * trait seam that makes swapping in xgboost4j a one-class change. */
class ClassifierSpec extends AnyFunSuite with SparkSpec {

  // three linearly separable classes in 4-d (seeded, deterministic)
  private def sample(): Array[(Int, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    Array.tabulate(300) { i =>
      val c = i % 3
      val base = Array(0f, 0f, 0f, 0f)
      base(c) = 10f
      (c, base.map(_ + rnd.nextFloat()))
    }
  }

  private def contract(clf: Classifier, absentClassesZero: Boolean): Unit = {
    val rows = sample()
    val model = clf.train(rows)
    assert(model.nonEmpty)

    val probs = clf.scoreBatch(model, rows.iterator.map(_._2)).toArray
    assert(probs.length == rows.length)
    assert(probs.forall(_.length == 9))
    probs.foreach { p =>
      val s = p.map(_.toDouble).sum
      assert(math.abs(s - 1.0) < 1e-3)
      // RF pads classes absent from the sample with exact zeros;
      // softmax legitimately spreads small mass over all 9
      if (absentClassesZero)
        (3 until 9).foreach(c => assert(p(c) == 0f))
    }
    // separable data: argmax recovers the label
    val acc = probs.zip(rows).count { case (p, (l, _)) =>
      p.indexOf(p.max) == l
    }.toDouble / rows.length
    assert(acc > 0.95, s"accuracy $acc")

    // deterministic scoring under re-run (task-retry idempotency)
    val again = clf.scoreBatch(model, rows.iterator.map(_._2)).toArray
    assert(probs.zip(again).forall { case (a, b) => a.sameElements(b) })
  }

  test("softmax classifier satisfies the trainer contract") {
    contract(new SoftmaxClassifier(), absentClassesZero = false)
  }

  test("random-forest classifier satisfies the trainer contract") {
    spark // force session init so SparkSession.active resolves
    contract(new RandomForestSparkClassifier(), absentClassesZero = true)
  }

  test("random-forest pads absent classes instead of injecting rows (M4)") {
    spark
    val clf = new RandomForestSparkClassifier(numTrees = 10)
    val rows = sample()
    val model = clf.train(rows)
    val p = clf.scoreBatch(model, Iterator(rows.head._2)).next()
    assert(p.length == 9)
    assert((3 until 9).forall(c => p(c) == 0f))
  }
}
