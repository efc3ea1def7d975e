package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{DotMatrix, DotProduct, MinHashSig, PredictionDates, SimHashBits}

/** Session extension registering the engine's native expressions into
  * the SQL function registry, so the whole surface is reachable from
  * `spark.sql(...)` text as well as the Column API:
  *
  *   - `dot_product(array<double>, array<double>)` — codegen'd scalar
  *   - `prediction_dates(sday, eday, month, day)` — C3 generator UDTF
  *   - `minhash_sig(array<bigint>, k)` — single-pass k-component MinHash
  *   - `simhash_bits(array<bigint>, bits)` — single-pass SimHash
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.builders

  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, clazz, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
    // range-join -> banded equi-join rewrite (graft.plans.BandedRangeJoin)
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoin)
    // whole-operator top-k-per-key: partial-heap -> exchange -> exact
    // final (graft.plans.TopKPerKey / graft.ops.TopK.perKey), plus the
    // rewrite that upgrades row_number-window rank filters to it
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RankToTopK)
  }
}

object GraftExtensions {

  /** Width/size arguments arrive from SQL as literal expressions; the
    * expression constructors take them as plain ints. */
  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case n: Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private val builders
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", classOf[DotProduct].getName,
      children => DotProduct(children(0), children(1))),
    ("prediction_dates", classOf[PredictionDates].getName,
      children => PredictionDates(
        children(0), children(1), children(2), children(3))),
    ("minhash_sig", classOf[MinHashSig].getName,
      children => MinHashSig(children(0),
        intArg(children(1), "minhash_sig size"))),
    ("simhash_bits", classOf[SimHashBits].getName,
      children => SimHashBits(children(0),
        intArg(children(1), "simhash_bits width"))),
    ("dot_matrix", classOf[DotMatrix].getName,
      children => {
        // the matrix must be a literal array<array<double>>: fold it
        // once at resolution into the expression's constant
        val m = children(1)
        require(m.foldable,
          "dot_matrix matrix must be a literal array of double arrays")
        val ad = m.eval().asInstanceOf[ArrayData]
        val rows = Array.tabulate(ad.numElements())(r =>
          ad.getArray(r).toDoubleArray())
        DotMatrix(children(0), rows)
      }))

  /** Register the same functions + optimizer rule on an already-running
    * session (the extensions config only applies at session build time). */
  def install(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    builders.foreach { case (name, clazz, builder) =>
      ColumnBridge.registerFunction(spark, name,
        new ExpressionInfo(clazz, name), builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.BandedRangeJoin))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.BandedRangeJoin)
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies ++=
        Seq(graft.plans.TopKStrategy)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.RankToTopK))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.RankToTopK)
  }

  /** Register every testdata table as a temp view so the engine is
    * driveable from SQL text (`spark.sql("SELECT ... FROM lineitem")`).
    */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { t =>
      try Tables(spark, dir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () }
    }
}
