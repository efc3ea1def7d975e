package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.StringToColumn
import graft.functions.DateExprs

/** Feature-matrix assembly and the training-side relational operators
  * (SURVEY.md §2: J1 combine, F1/F2 filters, P2/P3 projections, A1
  * statistics, A2 stratified sample, C1/C4 scalar columns).
  *
  * Column order is the model contract (SURVEY §7.4 hard part 2): label,
  * aspect, posidex, slope, mpw, dem, then per band in **bl, gr, ni, re,
  * s1, s2, th** order (nir before red!): coef x7, rmse, ar
  * (ref: blackmagic/segaux.py:248-275). One source of truth: this file.
  */
object Features {

  /** Training band order — NOT the alphabetical-ish segment field order. */
  val bandOrder: Seq[String] = Seq("bl", "gr", "ni", "re", "s1", "s2", "th")

  /** F1 aux label filter: drop unlabeled pixels
    * (ref: blackmagic/segaux.py:105-110). */
  def auxFilter(aux: DataFrame): DataFrame =
    aux.filter(element_at($"nlcdtrn", 1) =!= 0)

  /** F2/J2 segment interval filter: training date inside [sday, eday]
    * (ref: blackmagic/blueprints/tile.py:77-85). */
  def segmentsFilter(segments: DataFrame, date: String): DataFrame =
    segments.filter(lit(date).cast("date").between($"sday", $"eday"))

  /** J1 combine: segments ⋈ aux on the composite pixel key. The aux side
    * is ≤10k rows per chip — broadcast hash join, mirroring the
    * reference's in-process hash map (ref: blackmagic/segaux.py:113-126).
    * At tile scale (2,500 chips) aux is still ~25M small rows; callers
    * may drop the broadcast hint and let AQE pick sort-merge.
    */
  def combine(segments: DataFrame, aux: DataFrame,
      broadcastAux: Boolean = true): DataFrame = {
    val a = if (broadcastAux) broadcast(aux) else aux
    segments.join(a, Seq("cx", "cy", "px", "py"), "inner")
  }

  /** C1: per-band average reflectance ar = int + coef(0) * ordinal(date).
    * `dateCol` is the stamped training date (C4) or the exploded pday. */
  def withAverageReflectance(df: DataFrame, dateCol: Column): DataFrame =
    bandOrder.foldLeft(df) { (d, b) =>
      d.withColumn(s"${b}ar", DateExprs.averageReflectance(
        col(s"${b}int"), col(s"${b}coef"), dateCol))
    }

  /** P2: the 68-wide independent vector (everything but the label), in
    * contract order. Requires `{band}ar` columns (withAverageReflectance)
    * and non-default segments (coef arrays of length 7) — default rows
    * must be routed out first, the reference's ragged-row lesson
    * (test/test_D_prediction.py:598-631). */
  def independentArray: Column = {
    val head = array(
      element_at($"aspect", 1).cast("double"),
      element_at($"posidex", 1).cast("double"),
      element_at($"slope", 1).cast("double"),
      element_at($"mpw", 1).cast("double"),
      element_at($"dem", 1).cast("double"))
    val perBand = bandOrder.map { b =>
      concat(
        col(s"${b}coef").cast("array<double>"),
        array(col(s"${b}rmse").cast("double"), col(s"${b}ar").cast("double")))
    }
    concat(head +: perBand: _*)
  }

  /** P3: dependent variable = nlcdtrn label (int, the reference casts to
    * int8; ref blackmagic/segaux.py:70-83). */
  def label: Column = element_at($"nlcdtrn", 1).cast("int")

  /** A1 statistics: per-class counts and percent-of-total
    * (ref: blackmagic/blueprints/tile.py:191-212). */
  def statistics(data: DataFrame, labelCol: String = "label"): DataFrame = {
    data.groupBy(col(labelCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pct", col("cnt") / sum(col("cnt")).over(Window.partitionBy()))
  }

  /** A2 stratified sample: per-class target = ceil(target * pct) clamped
    * to [classMin, classMax]; rows chosen by a seeded shuffle within each
    * class (ref: blackmagic/blueprints/tile.py:242-284 + the prototype's
    * per-class shuffle, references/xg-train-annualized.py:53-74).
    *
    * Scale shape: one aggregate for the caps (tiny, broadcast), then a
    * two-phase pick. A per-class `row_number` window alone would sort a
    * WHOLE class inside one task — at the reference's caps a class can
    * be 8M rows of 100 TB input, which is the skew bottleneck. So when
    * a class is much larger than its cap, a Bernoulli pre-thin keeps
    * each row with p = (cap + 10*sqrt(cap) + 100) / cnt first; the
    * window then ranks ~cap survivors instead of the full class. The
    * margin puts a shortfall >=10 sigma below the mean (P < 1e-20), and
    * classes near their cap skip thinning entirely, so the exact-cap
    * contract holds: min(cap, class size) rows per class, uniformly
    * chosen. One shuffle on the label key either way.
    */
  def stratifiedSample(data: DataFrame, targetSamples: Long, classMin: Long,
      classMax: Long, seed: Long = 42, labelCol: String = "label")
      : DataFrame = {
    val caps = statistics(data, labelCol)
      .select(col(labelCol), col("cnt"),
        least(greatest(ceil(lit(targetSamples) * col("pct")).cast("long"),
          lit(classMin)), lit(classMax)).as("cap"))
    val margin = col("cap") + lit(10) * sqrt(col("cap")) + lit(100)
    val keepP = when(col("cnt") > margin * 2, margin / col("cnt"))
      .otherwise(lit(1.0))
    val thinned = data.join(broadcast(caps), Seq(labelCol))
      .filter(rand(seed + 1) < keepP)
    val ranked = thinned.withColumn("rn",
      row_number().over(
        Window.partitionBy(col(labelCol)).orderBy(rand(seed))))
    ranked
      .filter(col("rn") <= col("cap"))
      .drop("rn", "cap", "cnt")
  }
}
