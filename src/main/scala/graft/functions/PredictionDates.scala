package graft.functions

import java.time.LocalDate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** SQL-callable UDTF form of the reference's only table-generating
  * function (C3, blackmagic/segaux.py:149-163): one `pday` row per
  * annual month/day date inside [sday, eday]; the 0001-01-01 default
  * segment yields exactly one sentinel row.
  *
  * The DataFrame-API path uses the pure-Column explode in
  * [[DateExprs.predictionDates]]; this Generator exists so the same
  * semantics are reachable from Spark SQL text
  * (`SELECT prediction_dates(sday, eday, 7, 1) FROM segments`) —
  * SURVEY §4: the one custom Catalyst piece the SQL surface justifies.
  * Generators sit at plan boundaries, so CodegenFallback costs nothing
  * on the hot path.
  */
case class PredictionDates(
    sday: Expression, eday: Expression,
    month: Expression, day: Expression)
    extends Generator with CodegenFallback {

  /** Python date(1,1,1).toEpochDay */
  private val SentinelEpochDay: Long = LocalDate.of(1, 1, 1).toEpochDay

  override def children: Seq[Expression] = Seq(sday, eday, month, day)

  override def elementSchema: StructType =
    StructType(StructField("pday", DateType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (sday.dataType == DateType && eday.dataType == DateType &&
      month.dataType == IntegerType && day.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "prediction_dates expects (date, date, int, int)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = sday.eval(input)
    val e = eday.eval(input)
    val m = month.eval(input)
    val d = day.eval(input)
    if (s == null || e == null || m == null || d == null) Nil
    else {
      // DateType internal representation: days since 1970-01-01
      val sDays = s.asInstanceOf[Int].toLong
      val eDays = e.asInstanceOf[Int].toLong
      if (sDays == SentinelEpochDay && eDays == SentinelEpochDay)
        InternalRow(SentinelEpochDay.toInt) :: Nil
      else {
        val sd = LocalDate.ofEpochDay(sDays)
        val ed = LocalDate.ofEpochDay(eDays)
        (sd.getYear to ed.getYear).iterator
          .map(y => LocalDate.of(y, m.asInstanceOf[Int], d.asInstanceOf[Int]))
          .filter(p => !p.isBefore(sd) && !p.isAfter(ed))
          .map(p => InternalRow(p.toEpochDay.toInt))
          .toSeq
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sday = newChildren(0), eday = newChildren(1),
      month = newChildren(2), day = newChildren(3))
}
