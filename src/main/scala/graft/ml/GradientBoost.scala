package graft.ml

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import java.util.concurrent.{Callable, Executors}

/** Trainer configuration mirroring the reference's xgboost surface
  * (ref: blackmagic/__init__.py:13-26): num_round=500, test_size=0.2,
  * early_stopping_rounds=10, and the parameter block
  * {multi:softprob, num_class=9, max_depth=8, tree_method=hist,
  * eval_metric=mlogloss, nthread}. eta/lambda/minChildWeight carry
  * xgboost's documented defaults; maxBins is hist's default bin count.
  */
final case class BoostConfig(
    numRound: Int = 500,
    testSize: Double = 0.2,
    earlyStoppingRounds: Int = 10,
    numClass: Int = 9,
    maxDepth: Int = 8,
    eta: Double = 0.3,
    lambda: Double = 1.0,
    minChildWeight: Double = 1.0,
    maxBins: Int = 256,
    nThread: Int = Runtime.getRuntime.availableProcessors(),
    seed: Long = 42)

/** Watchlist outcome of one training run: how many boosting rounds
  * actually ran, which round had the best (lowest) eval mlogloss, and
  * the full eval history — the early-stopping evidence the reference
  * gets from xgb.train's evals/early_stopping_rounds pair
  * (ref: blackmagic/blueprints/tile.py:287-331). */
final case class BoostReport(
    roundsRun: Int,
    bestRound: Int,
    bestScore: Double,
    evalHistory: Array[Double])

object GradientBoostedClassifier {

  /** A hand-authored tree in the trainer's flat-node form: node i
    * splits on `feature(i)` at `thr(i)` (rows with value <= thr go to
    * `left(i)`), and `feature(i) == -1` marks a leaf whose VALUE is in
    * `thr(i)`. */
  final case class LiteralTree(feature: Array[Int], thr: Array[Double],
      left: Array[Int], right: Array[Int])

  /** Serialize a literal ensemble in exactly the byte format
    * [[GradientBoostedClassifier.train]] emits (rounds × numClass
    * trees, class-major within a round) — the seam m5 uses to
    * oracle-check the deserialize → tree-walk → margin-accumulate →
    * softmax scoring path against a SQL twin built from the same
    * literals. */
  def modelOf(d: Int, k: Int,
      rounds: Seq[Seq[LiteralTree]]): Array[Byte] = {
    require(rounds.forall(_.length == k),
      s"each round needs exactly $k class trees")
    writeModel(d, k, rounds.map(_.map(t =>
      (t.feature, t.thr, t.left, t.right))))
  }

  /** The ONE wire-format writer ([[modelOf]] and the trainer's
    * serialize both route here, so the format cannot drift between
    * the m5 oracle seam and trained models): header (k, d, #rounds),
    * then per tree #nodes followed by (feature, thr, left, right)
    * rows. */
  private[ml] def writeModel(d: Int, k: Int,
      rounds: Seq[Seq[(Array[Int], Array[Double], Array[Int], Array[Int])]])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(d); out.writeInt(rounds.length)
    rounds.foreach(_.foreach { case (feature, thr, left, right) =>
      out.writeInt(feature.length)
      var i = 0
      while (i < feature.length) {
        out.writeInt(feature(i)); out.writeDouble(thr(i))
        out.writeInt(left(i)); out.writeInt(right(i))
        i += 1
      }
    })
    out.flush()
    bos.toByteArray
  }
}

/** M2 trainer-protocol parity: a histogram-binned multiclass
  * gradient-boosted-tree trainer replicating the reference's xgboost
  * training protocol (ref: blackmagic/blueprints/tile.py:287-331) on
  * the same single-node bounded sample the reference trains on:
  *
  *  1. seeded train/eval split at `testSize` (the reference's
  *     sklearn train_test_split);
  *  2. features quantile-binned to ≤ maxBins (tree_method=hist);
  *  3. each round fits one depth-≤maxDepth regression tree per class
  *     on the softmax gradient/hessian (objective multi:softprob);
  *  4. after every round, mlogloss on the eval split (the watchlist);
  *  5. training stops when eval mlogloss hasn't improved for
  *     `earlyStoppingRounds` rounds, and the serialized model keeps
  *     only the trees up to the best round (best_ntree_limit scoring).
  *
  * Trees within a round are built concurrently on `nThread` threads
  * (the reference's nthread knob); the result is deterministic because
  * the K class trees of a round are independent given the round-start
  * margins and are merged by class index.
  *
  * Same bytes-in/bytes-out lifecycle and batch-scoring surface as the
  * other [[Classifier]] impls — swapping this in is a constructor
  * choice.
  */
final class GradientBoostedClassifier(
    val cfg: BoostConfig = BoostConfig()) extends Classifier {

  /** Report of the most recent train() on this instance (driver-side
    * introspection only; not part of the serialized model). */
  @transient @volatile var lastReport: BoostReport = _

  // ---- internal tree representation: flat parallel arrays ----------
  // feature(i) == -1 marks a leaf whose value is in thr(i); otherwise
  // rows with binned(feature) <= splitBin(i) (raw v <= thr(i)) go left.
  private final class Tree(
      val feature: Array[Int], val splitBin: Array[Int],
      val thr: Array[Double], val left: Array[Int], val right: Array[Int])

  override def train(rows: Array[(Int, Array[Float])]): Array[Byte] = {
    require(rows.nonEmpty, "empty training sample")
    val d = rows(0)._2.length
    val k = cfg.numClass
    require(rows.forall(r => r._1 >= 0 && r._1 < k),
      s"labels must lie in [0, $k) — found ${
        rows.iterator.map(_._1).filterNot(l => l >= 0 && l < k).next()}")

    // 1. seeded split (ref: train_test_split(test_size))
    val idx = new scala.util.Random(cfg.seed).shuffle(rows.indices.toVector)
    val nEval = math.min(rows.length - 1,
      math.round(rows.length * cfg.testSize).toInt)
    val evalIdx = idx.take(nEval).toArray
    val trainIdx = idx.drop(nEval).toArray
    val n = trainIdx.length

    // 2. quantile bin cuts from the train split only
    val cuts = Array.tabulate(d) { j =>
      val v = trainIdx.map(i => rows(i)._2(j).toDouble).sorted
      // Long cut index: (b+1)*n overflows Int past ~8.4M train rows
      // (255 * 8.42M > 2^31) — the documented 20M-sample production
      // config would crash the trainer mid-binning
      val qs = Array.tabulate(cfg.maxBins - 1)(b =>
        v(((b + 1).toLong * n / cfg.maxBins).toInt))
      qs.distinct
    }
    // bins are stored as Short: the bin id is < maxBins (256 default,
    // bounded by the require below), and the binned matrix is the
    // largest training allocation — Int cells would double the
    // documented sample budget for no information
    require(cfg.maxBins <= Short.MaxValue,
      s"maxBins ${cfg.maxBins} exceeds the Short bin representation")
    def binRow(f: Array[Float]): Array[Short] = Array.tabulate(d) { j =>
      // smallest bin b with v <= cuts(j)(b); v above all cuts -> #cuts
      val c = cuts(j); val v = f(j).toDouble
      var lo = 0; var hi = c.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (v <= c(m)) hi = m else lo = m + 1
      }
      lo.toShort
    }
    val binned = trainIdx.map(i => binRow(rows(i)._2))
    val evalBinned = evalIdx.map(i => binRow(rows(i)._2))
    val lab = trainIdx.map(i => rows(i)._1)
    val evalLab = evalIdx.map(i => rows(i)._1)

    val margins = Array.ofDim[Double](n, k)
    val evalMargins = Array.ofDim[Double](evalIdx.length, k)
    val probs = Array.ofDim[Double](n, k)
    val g = Array.ofDim[Double](k, n)
    val h = Array.ofDim[Double](k, n)

    val trees = Vector.newBuilder[Array[Tree]]
    val history = Array.newBuilder[Double]
    var best = Double.MaxValue
    var bestRound = -1
    var round = 0
    var stop = false
    val pool = Executors.newFixedThreadPool(math.max(1, math.min(cfg.nThread, k)))
    try {
      while (round < cfg.numRound && !stop) {
        // 3. softmax grad/hess from the round-start margins
        var i = 0
        while (i < n) {
          softmax(margins(i), probs(i))
          var c = 0
          while (c < k) {
            val p = probs(i)(c)
            g(c)(i) = p - (if (lab(i) == c) 1.0 else 0.0)
            h(c)(i) = math.max(p * (1.0 - p), 1e-16)
            c += 1
          }
          i += 1
        }
        val roundTrees = pool.invokeAll(
          java.util.Arrays.asList((0 until k).map { c =>
            new Callable[Tree] {
              def call(): Tree = buildTree(binned, g(c), h(c), cuts)
            }
          }: _*)).toArray.map(_.asInstanceOf[java.util.concurrent.Future[Tree]].get())
        trees += roundTrees
        var c = 0
        while (c < k) {
          val t = roundTrees(c)
          var r = 0
          while (r < n) { margins(r)(c) += predictBinned(t, binned(r)); r += 1 }
          r = 0
          while (r < evalIdx.length) {
            evalMargins(r)(c) += predictBinned(t, evalBinned(r)); r += 1
          }
          c += 1
        }
        // 4. watchlist: eval mlogloss (train-set fallback when testSize=0)
        val (ms, mlab) = if (evalIdx.nonEmpty) (evalMargins, evalLab)
          else (margins, lab)
        var loss = 0.0
        val tmp = new Array[Double](k)
        var r = 0
        while (r < ms.length) {
          softmax(ms(r), tmp)
          loss -= math.log(math.max(tmp(mlab(r)), 1e-15))
          r += 1
        }
        loss /= ms.length
        history += loss
        if (loss < best) { best = loss; bestRound = round }
        // 5. early stop — only when a real eval split exists
        if (evalIdx.nonEmpty &&
            round - bestRound >= cfg.earlyStoppingRounds) stop = true
        round += 1
      }
    } finally pool.shutdown()

    lastReport = BoostReport(round, bestRound, best, history.result())
    serialize(d, k, trees.result().take(bestRound + 1))
  }

  /** Greedy depth-bounded regression tree on (g, h) with xgboost's
    * gain = 0.5*(GL²/(HL+λ) + GR²/(HR+λ) − G²/(H+λ)) and leaf weight
    * −G/(H+λ), eta folded into the stored leaf value. */
  private def buildTree(binned: Array[Array[Short]], g: Array[Double],
      h: Array[Double], cuts: Array[Array[Double]]): Tree = {
    val d = cuts.length
    val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    val splitBin = scala.collection.mutable.ArrayBuffer.empty[Int]
    val thr = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    var nNodes = 0

    def leaf(gSum: Double, hSum: Double): Int = {
      val id = nNodes; nNodes += 1
      feature += -1; splitBin += -1
      thr += -gSum / (hSum + cfg.lambda) * cfg.eta
      left += -1; right += -1
      id
    }

    def grow(rowIds: Array[Int], depth: Int): Int = {
      var gSum = 0.0; var hSum = 0.0
      var i = 0
      while (i < rowIds.length) {
        gSum += g(rowIds(i)); hSum += h(rowIds(i)); i += 1
      }
      if (depth >= cfg.maxDepth || rowIds.length < 2) return leaf(gSum, hSum)

      val parentScore = gSum * gSum / (hSum + cfg.lambda)
      var bestGain = 0.0
      var bestFeat = -1; var bestBin = -1
      var j = 0
      while (j < d) {
        val nb = cuts(j).length + 1
        val hg = new Array[Double](nb); val hh = new Array[Double](nb)
        i = 0
        while (i < rowIds.length) {
          val b = binned(rowIds(i))(j)
          hg(b) += g(rowIds(i)); hh(b) += h(rowIds(i)); i += 1
        }
        var gl = 0.0; var hl = 0.0
        var b = 0
        while (b < nb - 1) {
          gl += hg(b); hl += hh(b)
          val hr = hSum - hl
          if (hl >= cfg.minChildWeight && hr >= cfg.minChildWeight) {
            val gr = gSum - gl
            val gain = gl * gl / (hl + cfg.lambda) +
              gr * gr / (hr + cfg.lambda) - parentScore
            if (gain > bestGain + 1e-12) {
              bestGain = gain; bestFeat = j; bestBin = b
            }
          }
          b += 1
        }
        j += 1
      }
      if (bestFeat < 0) return leaf(gSum, hSum)

      val (l, r) = rowIds.partition(binned(_)(bestFeat) <= bestBin)
      val id = nNodes; nNodes += 1
      feature += bestFeat; splitBin += bestBin
      thr += cuts(bestFeat)(bestBin)
      left += -1; right += -1 // placeholders, patched after recursion
      left(id) = grow(l, depth + 1)
      right(id) = grow(r, depth + 1)
      id
    }

    grow(binned.indices.toArray, 0)
    new Tree(feature.toArray, splitBin.toArray, thr.toArray,
      left.toArray, right.toArray)
  }

  private def predictBinned(t: Tree, row: Array[Short]): Double = {
    var node = 0
    while (t.feature(node) >= 0)
      node = if (row(t.feature(node)) <= t.splitBin(node)) t.left(node)
        else t.right(node)
    t.thr(node)
  }

  private def predictRaw(t: Tree, f: Array[Float]): Double = {
    var node = 0
    while (t.feature(node) >= 0)
      node = if (f(t.feature(node)).toDouble <= t.thr(node)) t.left(node)
        else t.right(node)
    t.thr(node)
  }

  private def softmax(m: Array[Double], out: Array[Double]): Unit = {
    var mx = Double.NegativeInfinity
    var c = 0
    while (c < m.length) { if (m(c) > mx) mx = m(c); c += 1 }
    var z = 0.0
    c = 0
    while (c < m.length) { out(c) = math.exp(m(c) - mx); z += out(c); c += 1 }
    c = 0
    while (c < m.length) { out(c) /= z; c += 1 }
  }

  override def scoreBatch(model: Array[Byte],
      rows: Iterator[Array[Float]]): Iterator[Array[Float]] = {
    val (k, d, rounds) = deserialize(model)
    val margins = new Array[Double](k)
    val out0 = new Array[Double](k)
    rows.map { f =>
      // the serialized width exists exactly for this check: scoring a
      // 68-wide row with a 64-wide model would silently read
      // misaligned features and return plausible-but-wrong probs
      require(f.length == d,
        s"feature width ${f.length} != model width $d")
      java.util.Arrays.fill(margins, 0.0)
      var r = 0
      while (r < rounds.length) {
        var c = 0
        while (c < k) { margins(c) += predictRaw(rounds(r)(c), f); c += 1 }
        r += 1
      }
      softmax(margins, out0)
      val out = new Array[Float](k)
      var c = 0
      while (c < k) { out(c) = out0(c).toFloat; c += 1 }
      out
    }
  }

  /** Boosted-tree count in a serialized model (rounds × numClass) —
    * the knob-visibility hook for specs. */
  def treeCount(model: Array[Byte]): Int = {
    val (k, _, rounds) = deserialize(model)
    rounds.length * k
  }

  private def serialize(d: Int, k: Int,
      rounds: Vector[Array[Tree]]): Array[Byte] =
    GradientBoostedClassifier.writeModel(d, k,
      rounds.map(_.toSeq.map(t => (t.feature, t.thr, t.left, t.right))))

  private def deserialize(bytes: Array[Byte])
      : (Int, Int, Array[Array[Tree]]) = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val k = in.readInt(); val d = in.readInt(); val nr = in.readInt()
    val rounds = Array.fill(nr)(Array.fill(k) {
      val nn = in.readInt()
      val feature = new Array[Int](nn); val thr = new Array[Double](nn)
      val left = new Array[Int](nn); val right = new Array[Int](nn)
      var i = 0
      while (i < nn) {
        feature(i) = in.readInt(); thr(i) = in.readDouble()
        left(i) = in.readInt(); right(i) = in.readInt()
        i += 1
      }
      new Tree(feature, null, thr, left, right)
    })
    (k, d, rounds)
  }
}
