package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, PredictionDates}

/** Session extension registering the engine's native expressions into
  * the SQL function registry, so the whole surface is reachable from
  * `spark.sql(...)` text as well as the Column API:
  *
  *   - `dot_product(array<double>, array<double>)` — codegen'd scalar
  *   - `prediction_dates(sday, eday, month, day)` — C3 generator UDTF
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * or `GraftExtensions.install(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("prediction_dates"),
      new ExpressionInfo(classOf[PredictionDates].getName,
        "prediction_dates"),
      (children: Seq[Expression]) => PredictionDates(
        children(0), children(1), children(2), children(3))))
  }
}

object GraftExtensions {

  /** Register the same functions on an already-running session (the
    * extensions config only applies at session build time). */
  def install(spark: SparkSession): Unit = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.registerFunction(spark, "dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      children => DotProduct(children(0), children(1)))
    ColumnBridge.registerFunction(spark, "prediction_dates",
      new ExpressionInfo(classOf[PredictionDates].getName,
        "prediction_dates"),
      children => PredictionDates(
        children(0), children(1), children(2), children(3)))
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
