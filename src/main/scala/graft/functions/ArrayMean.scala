package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of array columns (SURVEY §2.4 A4: the reference's
  * `np.mean(probs, axis=0)` over annual probability vectors), as a
  * typed Aggregator — map-side partial aggregation (one running-sum
  * array + count per group per partition), so a 100 TB groupBy ships
  * one buffer per group per task, not the rows.
  *
  * Usage: `df.groupBy(k).agg(ArrayMean.udaf($"vec"))` or register
  * via `spark.udf.register("array_mean", ArrayMean.udaf)`.
  */
final case class ArrayMeanBuf(var sums: Array[Double], var n: Long)

object ArrayMean
    extends Aggregator[Seq[Double], ArrayMeanBuf, Seq[Double]] {

  private type Buf = ArrayMeanBuf
  private def Buf(sums: Array[Double], n: Long) = ArrayMeanBuf(sums, n)

  override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  override def reduce(b: Buf, a: Seq[Double]): Buf = {
    if (b.sums.isEmpty) b.sums = new Array[Double](a.length)
    var i = 0
    while (i < a.length && i < b.sums.length) {
      b.sums(i) += a(i); i += 1
    }
    b.n += 1
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    if (x.sums.isEmpty) { x.sums = y.sums; x.n += y.n; x }
    else {
      var i = 0
      while (i < y.sums.length && i < x.sums.length) {
        x.sums(i) += y.sums(i); i += 1
      }
      x.n += y.n
      x
    }
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.toSeq.map(_ / b.n)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[Double]]()
  }

  /** Untyped-Column form for DataFrame `agg`. */
  def udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this)
}
