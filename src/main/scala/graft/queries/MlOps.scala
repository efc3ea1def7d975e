package graft.queries

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.core.PixelTimeseries
import graft.ml.{BoostConfig, GradientBoostedClassifier}
import graft.ops.{HarmonicCcd, SegmentPipeline}

/** ML operators (SURVEY §2.9 M1–M3) exercised over the driver testdata.
  * Not SQL-expressible, so these register without oracles (the driver
  * records a rows-only check); exact-value coverage lives in
  * CcdSpec/PipelinesSpec golden tests.
  *
  * m1 derives per-key "pixel" time series from the events table
  * (user_id = pixel, ts = ordinal day, 7 band transforms of value) and
  * runs the CCD kernel per key via mapPartitions — the canonical
  * heavy-UDF placement. m2/m3 train and score the softmax classifier
  * on the embeddings table with the bounded-collect contract.
  */
object MlOps {

  /** m2 sample caps, mirroring the reference's target_samples /
    * class_min / class_max trainer surface (ref:
    * blackmagic/__init__.py:17-19). They bound the driver collect to at
    * most numClasses * TrainClassMax rows no matter the corpus size. */
  private[graft] val TrainTargetSamples = 100000L
  private[graft] val TrainClassMin = 100L
  private[graft] val TrainClassMax = 20000L

  /** M2's sanctioned driver collect, bounded BEFORE collection: the
    * stratified caps run distributed-side (one shuffle on label), so the
    * driver materializes ≤ classes*classMax rows — the same shape as
    * TrainingPipeline (SURVEY §7.4.5). `labeled` must be (label, f). */
  private[graft] def trainingSample(
      labeled: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.ops.Features.stratifiedSample(labeled, TrainTargetSamples,
      TrainClassMin, TrainClassMax).select(col("label"), col("f"))

  private def eventTimeseries(s: SparkSession, dir: String) = {
    import s.implicits._
    implicit val tsEnc = Encoders.product[PixelTimeseries]
    Tables(s, dir, "events")
      .select($"user_id", $"ts", $"value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, rows) =>
        val sorted = rows.toArray.sortBy(_._2.getTime)
        val dates = sorted.map(r =>
          (r._2.getTime / 86400000L).toInt + 719163) // epoch-day -> ordinal
        def band(k: Double, off: Double): Array[Int] =
          sorted.map(r => (r._3 * k + off).toInt)
        PixelTimeseries(0L, 0L, uid, 0L, dates,
          band(1, 0), band(2, 10), band(3, 20), band(4, 30),
          band(5, 40), band(6, 50), band(7, 60),
          Array.fill(sorted.length)(0))
      }
  }

  // ---- m4 fixed-weight scoring: the softmax forward pass is
  // deterministic closed-form math, so with LITERAL weights the whole
  // scoring arithmetic (dot, bias, exp, normalize, argmax) can be
  // hash-checked against a DuckDB twin — shrinking the engine's
  // no-oracle surface to training only. The weight doubles are
  // generated once on the driver and embedded in BOTH plans via
  // full-precision decimal round-trip, so the engines consume
  // bit-identical constants.
  private val FixedK = 10
  private val FixedDim = 64
  private[graft] lazy val fixedWeights: Array[Array[Double]] =
    Array.tabulate(FixedK)(c =>
      Array.tabulate(FixedDim)(i => math.sin(c * 31 + i * 7 + 1.0) / 8))
  private[graft] lazy val fixedBias: Array[Double] =
    Array.tabulate(FixedK)(_ / 100.0)

  private def sqlWeightDot(c: Int): String = {
    val w = "[" + fixedWeights(c).mkString(", ") + "]"
    s"(list_sum(list_transform(range(1, ${FixedDim + 1}), " +
      s"i -> v[CAST(i AS INT)] * ($w)[CAST(i AS INT)])) + ${fixedBias(c)})"
  }

  /** Shared m4/m6 oracle fragments: the forward-pass CTE chain up to
    * `zt` (logits, max, partition function) and the argmax CASE. */
  private def sqlFixedCtes: String = {
    val ls = (0 until FixedK).map(c => s"${sqlWeightDot(c)} AS l$c")
    val names = (0 until FixedK).map(c => s"l$c")
    val mx = s"greatest(${names.mkString(", ")})"
    val z = names.map(n => s"exp($n - mx)").mkString(" + ")
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |l AS (SELECT vec_id, ${ls.mkString(", ")} FROM e),
       |m AS (SELECT *, $mx AS mx FROM l),
       |zt AS (SELECT *, ($z) AS z FROM m)""".stripMargin
  }
  private def sqlArgmax: String =
    "CASE " + (0 until FixedK)
      .map(c => s"WHEN l$c = mx THEN $c").mkString(" ") + " END"

  private def sqlFixedScore: String =
    s"""WITH $sqlFixedCtes
       |SELECT vec_id, CAST($sqlArgmax AS BIGINT) AS predicted,
       |  round(1.0 / z, 4) AS top_prob,
       |  round(exp(l0 - mx) / z, 4) AS p0
       |FROM zt ORDER BY vec_id""".stripMargin

  // ---- m5 fixed-TREE scoring: m4 oracle-checked the softmax forward
  // pass; this closes the remaining no-oracle surface around the GBT
  // path by scoring a LITERAL hand-authored ensemble through the real
  // model lifecycle — GradientBoostedClassifier.modelOf serializes it
  // in the trainer's byte format, scoreBatch deserializes and walks
  // the trees — while the SQL twin replays the same trees as nested
  // CASE expressions. Margin accumulation and argmax are exact (leaf
  // values are 2-decimal literals, so distinct margins differ by
  // >= 0.01 — never inside float epsilon); the softmax probs are
  // compared after an explicit double->float->double round-trip in
  // BOTH engines, which absorbs the last-ulp exp() differences.
  private val M5K = 3

  private def m5tree(fRoot: Int, fL: Int, fR: Int, tRoot: Double,
      tL: Double, tR: Double, w: (Double, Double, Double, Double))
      : GradientBoostedClassifier.LiteralTree =
    GradientBoostedClassifier.LiteralTree(
      feature = Array(fRoot, fL, fR, -1, -1, -1, -1),
      thr = Array(tRoot, tL, tR, w._1, w._2, w._3, w._4),
      left = Array(1, 3, 5, -1, -1, -1, -1),
      right = Array(2, 4, 6, -1, -1, -1, -1))

  /** 2 rounds x 3 classes of depth-2 trees over distinct embedding
    * dims; thresholds sit inside the data's interquartile range so
    * every branch is populated. */
  private[graft] lazy val m5Trees
      : Seq[Seq[GradientBoostedClassifier.LiteralTree]] = Seq(
    Seq(m5tree(1, 5, 9, 0.0, -0.08, 0.08, (0.31, -0.11, 0.02, -0.27)),
      m5tree(2, 6, 10, 0.05, 0.0, -0.05, (0.24, -0.08, 0.13, -0.19)),
      m5tree(3, 7, 11, -0.05, 0.08, 0.0, (-0.21, 0.17, 0.29, -0.06))),
    Seq(m5tree(13, 17, 21, 0.08, 0.0, -0.08, (0.12, -0.22, 0.33, -0.04)),
      m5tree(14, 18, 22, 0.0, 0.05, 0.08, (-0.14, 0.26, 0.07, -0.18)),
      m5tree(15, 19, 23, -0.08, -0.05, 0.05, (0.19, -0.09, -0.25, 0.28))))

  /** The tree as a nested SQL CASE over the 1-based `v` array —
    * generated from the SAME LiteralTree the engine scores, so the
    * two representations cannot drift. */
  private def sqlTree(t: GradientBoostedClassifier.LiteralTree,
      node: Int): String =
    if (t.feature(node) < 0) t.thr(node).toString
    else s"(CASE WHEN v[${t.feature(node) + 1}] <= ${t.thr(node)} " +
      s"THEN ${sqlTree(t, t.left(node))} " +
      s"ELSE ${sqlTree(t, t.right(node))} END)"

  private def sqlTreeScore: String = {
    val ls = (0 until M5K).map(c =>
      s"(${sqlTree(m5Trees(0)(c), 0)} + ${sqlTree(m5Trees(1)(c), 0)}) AS l$c")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |l AS (SELECT vec_id, ${ls.mkString(",\n       |  ")} FROM e),
       |m AS (SELECT *, greatest(l0, l1, l2) AS mx FROM l),
       |z AS (SELECT *, (exp(l0 - mx) + exp(l1 - mx) + exp(l2 - mx)) AS zz
       |  FROM m)
       |SELECT vec_id,
       |  CAST(CASE WHEN l0 >= l1 AND l0 >= l2 THEN 0
       |    WHEN l1 >= l2 THEN 1 ELSE 2 END AS BIGINT) AS predicted,
       |  round(CAST(CAST(1.0 / zz AS FLOAT) AS DOUBLE), 4) AS top_prob,
       |  round(CAST(CAST(exp(l0 - mx) / zz AS FLOAT) AS DOUBLE), 4) AS p0
       |FROM z ORDER BY vec_id""".stripMargin
  }

  val qs: Map[String, Q] = Map(
    // ----- m5: oracle-checked scoring of a literal tree ensemble
    // through the serialized-model lifecycle (see m5Trees above)
    "m5_score_trees" -> Q(sqlTreeScore) { (s, dir) =>
      import s.implicits._
      val data = Tables(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<float>").as("f"))
      val model = GradientBoostedClassifier.modelOf(64, M5K, m5Trees)
      val bc = s.sparkContext.broadcast(model)
      val scored = data.as[(Long, Array[Float])]
        .mapPartitions { it =>
          val clf = new GradientBoostedClassifier()
          it.grouped(4096).flatMap { batch =>
            val probs = clf.scoreBatch(bc.value, batch.iterator.map(_._2))
            batch.iterator.zip(probs).map { case ((id, _), p) =>
              (id, p.indexOf(p.max).toLong, p.max, p(0))
            }
          }
        }
        .toDF("vec_id", "predicted", "tp", "pz")
      scored.select($"vec_id", $"predicted",
          round($"tp".cast("double"), 4).as("top_prob"),
          round($"pz".cast("double"), 4).as("p0"))
        .orderBy($"vec_id")
    },

    // ----- m4: oracle-checked batch scoring with fixed literal weights
    "m4_score_fixed" -> Q(sqlFixedScore) { (s, dir) =>
      import graft.StringToColumn
      val e = Tables(s, dir, "embeddings")
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val withLogits = e.withColumn("ld",
        graft.functions.DotMatrix($"v", fixedWeights))
      val l = (0 until FixedK).map(c =>
        element_at($"ld", c + 1) + lit(fixedBias(c)))
      val mx = greatest(l: _*)
      val z = l.map(lc => exp(lc - mx)).reduce(_ + _)
      // argmax via lexicographic struct max; negated class index makes
      // ties resolve to the SMALLEST class, matching the SQL CASE chain
      val predicted = -array_max(array(l.zipWithIndex.map {
        case (lc, c) => struct(lc.as("l"), lit(-c).as("negc"))
      }: _*)).getField("negc")
      withLogits.select($"vec_id",
          predicted.cast("long").as("predicted"),
          round(lit(1.0) / z, 4).as("top_prob"),
          round(exp(l.head - mx) / z, 4).as("p0"))
        .orderBy($"vec_id")
    },

    // ----- m6: confusion matrix + per-class recall over the m4
    // fixed-weight scorer — the evaluation record a scoring deployment
    // stores beside its predictions (which classes leak into which,
    // and each class's recall on the diagonal). Exact integers
    // throughout: cell counts, class totals, cell share in ppm — so
    // the whole evaluation hash-matches the oracle's replay of the
    // forward pass + argmax + count pivot. (The synthetic labels are
    // geometry-independent — x92 pinned that — so this matrix
    // correctly reads near-uniform rows; the QUERY is the artifact.)
    // Scale shape: scoring is the one corpus pass (codegen DotMatrix),
    // the matrix is a ≤K² aggregation.
    "m6_confusion" -> Q(
      s"""WITH $sqlFixedCtes,
         |p AS (SELECT vec_id, CAST($sqlArgmax AS BIGINT) AS predicted
         |  FROM zt),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS true_label
         |  FROM embeddings),
         |cells AS (SELECT true_label, predicted,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM p JOIN lab USING (vec_id) GROUP BY 1, 2),
         |ct AS (SELECT true_label, CAST(sum(n) AS BIGINT)
         |    AS class_total FROM cells GROUP BY 1)
         |SELECT c.true_label, c.predicted, c.n, ct.class_total,
         |  CAST((CAST(c.n AS HUGEINT) * 1000000) // ct.class_total
         |    AS BIGINT) AS cell_ppm
         |FROM cells c JOIN ct USING (true_label)
         |ORDER BY true_label, predicted""".stripMargin) { (s, dir) =>
      import graft.StringToColumn
      val e = Tables(s, dir, "embeddings")
        .select($"vec_id", $"label".cast("long").as("true_label"),
          $"embedding".cast("array<double>").as("v"))
      val withLogits = e.withColumn("ld",
        graft.functions.DotMatrix($"v", fixedWeights))
      val l = (0 until FixedK).map(c =>
        element_at($"ld", c + 1) + lit(fixedBias(c)))
      val predicted = -array_max(array(l.zipWithIndex.map {
        case (lc, c) => struct(lc.as("l"), lit(-c).as("negc"))
      }: _*)).getField("negc")
      val cells = withLogits
        .select($"true_label", predicted.cast("long").as("predicted"))
        .groupBy($"true_label", $"predicted")
        .agg(count(lit(1)).as("n"))
      val ct = cells.groupBy($"true_label")
        .agg(sum($"n").as("class_total"))
      cells.join(ct, "true_label")
        .select($"true_label", $"predicted", $"n", $"class_total",
          // 128-bit-wide numerator (x67 discipline): a >1e13-row
          // class would push n·1e6 past int64
          expr("(CAST(n AS DECIMAL(38,0)) * 1000000) div class_total")
            .as("cell_ppm"))
        .orderBy($"true_label", $"predicted")
    },

    // ----- M1 per-key CCD change detection over event-derived series
    "m1_ccd_detect" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      val det = SegmentPipeline.detect(eventTimeseries(s, dir), HarmonicCcd())
      det.flatMap(_.segments)
        .toDF()
        .groupBy($"px")
        .agg(count(lit(1)).as("n_segments"),
          min($"sday").as("first_sday"), max($"eday").as("last_eday"))
        .orderBy($"px")
    },

    // ----- M2+M5 train (bounded collect) + M3 broadcast batch score:
    // confusion summary of the softmax classifier on embeddings
    "m2_train_score" -> Q.noOracle { (s, dir) =>
      import s.implicits._
      val data = Tables(s, dir, "embeddings")
        .select($"vec_id", $"label", $"embedding".cast("array<float>").as("f"))
      val sample = trainingSample(data.select($"label", $"f"))
        .as[(Int, Array[Float])].collect()
      // Reference trainer protocol (hist GBT + mlogloss watchlist +
      // early stop, tile.py:287-331), rounds scaled to the testdata —
      // production keeps BoostConfig()'s num_round=500 default.
      val clf = new GradientBoostedClassifier(BoostConfig(
        numRound = 60, numClass = 10, maxDepth = 4))
      val model = clf.train(sample)
      val bc = s.sparkContext.broadcast(model)
      val scored = data.select($"vec_id", $"label", $"f")
        .as[(Long, Int, Array[Float])]
        .mapPartitions { it =>
          val clf2 = new GradientBoostedClassifier()
          // fixed-size batches bound task memory while keeping the
          // vectorized-batch scoring shape (same as PredictionPipeline)
          it.grouped(32768).flatMap { batch =>
            val probs = clf2.scoreBatch(bc.value, batch.iterator.map(_._3))
            batch.iterator.zip(probs).map { case ((id, lab, _), p) =>
              (id, lab, p.indexOf(p.max))
            }
          }
        }
        .toDF("vec_id", "label", "predicted")
      scored.groupBy($"label", $"predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy($"label", $"predicted")
    },

    // ----- m3 closed-form per-group OLS trend (the regression kernel
    // inside CCD, reduced to normal equations so it IS oracle-checkable
    // unlike m1/m2): slope/intercept of total price over order date per
    // customer. All sufficient statistics (n, Σx, Σy, Σxx, Σxy) are
    // EXACT integer sums — order-independent under distributed
    // aggregation, so both engines derive bit-identical doubles. The
    // 6-decimal rounding is written as floor(x*1e6 + 0.5)/1e6 in BOTH
    // engines: identical IEEE ops on identical doubles, whereas
    // round(x, 6) hits engine-specific behavior exactly at scaled-ulp
    // boundaries (2/15k rows differed at sf0.1 before this). One
    // map-side-combined shuffle on the group key; the 100 TB shape.
    "m3_trend" -> Q(
      """WITH t AS (SELECT o_custkey,
        |  CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
        |    AS BIGINT) AS x,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders),
        |a AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(x*y) AS BIGINT) AS sxy
        |  FROM t GROUP BY 1),
        |f AS (SELECT o_custkey, n,
        |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
        |    AS slope_raw, sx, sy
        |  FROM a WHERE n >= 2 AND n*sxx - sx*sx <> 0)
        |SELECT o_custkey, n,
        |  floor(slope_raw * 1000000 + 0.5) / 1000000 AS slope,
        |  floor((CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) * 1000000 + 0.5) / 1000000 AS intercept
        |FROM f ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import graft.StringToColumn
      trendOver(Tables(s, dir, "orders").select($"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1992-01-01").cast("date"))
          .cast("long").as("x"),
        round($"o_totalprice" * 100).cast("long").as("y")))
    })

  /** m3's per-key least-squares core over a (o_custkey, x, y) long
    * frame — one map-side-combined shuffle on the key, exact integer
    * sums, the closed-form slope/intercept derived from bit-identical
    * doubles on both engines. Extracted so the overflow guard below is
    * pinnable against a pathological frame (PropertiesSpec). */
  private[graft] def trendOver(t: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import graft.StringToColumn
    val a = t.groupBy($"o_custkey").agg(
        count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      val num = ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
      val den = ($"n" * $"sxx" - $"sx" * $"sx").cast("double")
      val slope = num / den
      def r6(c: org.apache.spark.sql.Column) =
        floor(c * 1000000 + 0.5) / 1000000
      // LOUD 64-bit guard (the sppmi/x67 lesson): n·sxy and sx·sy
      // wrap silently once one key holds ~9k+ orders, and the oracle
      // shares the formula so the hash-match could not catch it —
      // worse, DuckDB's ANSI multiply THROWS on the same corpus while
      // Spark wraps, an engine-parity hole. The bound is on the SUM
      // of the two product magnitudes, not each product alone: num =
      // n·sxy − sx·sy is itself long arithmetic, and with mixed-sign
      // inputs two individually-safe ~8.9e18 products subtract to a
      // wrapping ~1.8e19. n·|sxy| + |sx|·|sy| < 9.0e18 bounds |num|
      // (triangle inequality) AND each product, all >200 ulps under
      // 2^63 in double space, so it trips before any wrap. den never
      // wraps under the same bound: n·sxx and sx² are both
      // non-negative (n·sxx ≥ sx²/… by Cauchy-Schwarz is not even
      // needed — each term is individually bounded and the
      // subtraction of non-negatives cannot exceed the larger).
      // Conservative by design: corpora whose true |num| lies in
      // [9.0e18, 2^63) are refused here though they would not wrap
      // (Spark throws, DuckDB computes) — the reverse-parity band is
      // the price of a driver-free double-space check; widen to
      // DECIMAL(38,0) for such corpora. assert_true is NULL on pass,
      // so the filter keeps every sane row and cannot be pruned away
      // with an unused column.
      val inRange =
        ($"n".cast("double") * abs($"sxy").cast("double") +
          abs($"sx").cast("double") * abs($"sy").cast("double")
          < 9.0e18) &&
        ($"n".cast("double") * $"sxx".cast("double") < 9.0e18) &&
        (abs($"sx").cast("double") * abs($"sx").cast("double")
          < 9.0e18)
      a.filter(assert_true(inRange,
          concat(lit("m3_trend: 64-bit overflow at o_custkey="),
            $"o_custkey".cast("string"),
            lit(" — per-key order volume exceeds the exact-long " +
              "trend bound; widen to DECIMAL(38,0) (the x67 " +
              "pattern) for this corpus"))).isNull)
        .filter($"n" >= 2 && ($"n" * $"sxx" - $"sx" * $"sx") =!= 0)
        .select($"o_custkey", $"n", r6(slope).as("slope"),
          r6(($"sy".cast("double") - slope * $"sx".cast("double"))
            / $"n".cast("double")).as("intercept"))
        .orderBy($"o_custkey")
  }
}
