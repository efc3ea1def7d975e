package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Hot-key-safe postings-list collector: gathers at most `cap` ids per
  * group while counting ALL of them. `collect_list` on a skewed key
  * buffers the entire posting (an unbounded per-key allocation — the
  * thing that OOMs an executor when one shingle appears in 10^8 docs);
  * this Aggregator stops retaining past the cap but keeps the exact
  * cardinality, so a df-cap filter (`n <= cap`) downstream still sees
  * the true count and over-cap groups carry only `cap` stale entries
  * that the filter discards anyway.
  *
  * Order of retained items is partition-order dependent — only use when
  * the consumer is order-insensitive (e.g. pair enumeration).
  */
final case class BoundedListBuf(var n: Long, var m: Int, var items: Array[Long])
final case class BoundedPosting(n: Long, ds: Seq[Long])

final class BoundedCollect(cap: Int)
    extends Aggregator[Long, BoundedListBuf, BoundedPosting] {

  override def zero: BoundedListBuf =
    BoundedListBuf(0L, 0, Array.emptyLongArray)

  private def ensure(b: BoundedListBuf, want: Int): Unit =
    if (b.items.length < want) {
      val grown = new Array[Long](math.min(cap, math.max(want, math.max(8, b.items.length * 2))))
      System.arraycopy(b.items, 0, grown, 0, b.m)
      b.items = grown
    }

  override def reduce(b: BoundedListBuf, a: Long): BoundedListBuf = {
    b.n += 1
    if (b.m < cap) { ensure(b, b.m + 1); b.items(b.m) = a; b.m += 1 }
    b
  }

  override def merge(x: BoundedListBuf, y: BoundedListBuf): BoundedListBuf = {
    x.n += y.n
    val take = math.min(y.m, cap - x.m)
    if (take > 0) {
      ensure(x, x.m + take)
      System.arraycopy(y.items, 0, x.items, x.m, take)
      x.m += take
    }
    x
  }

  override def finish(b: BoundedListBuf): BoundedPosting =
    BoundedPosting(b.n, b.items.take(b.m).toSeq)

  override def bufferEncoder: Encoder[BoundedListBuf] =
    Encoders.product[BoundedListBuf]
  override def outputEncoder: Encoder[BoundedPosting] =
    Encoders.product[BoundedPosting]
}

object BoundedCollect {
  /** Untyped-Column form: `agg(BoundedCollect.udaf(cap)($"id"))` →
    * struct(n BIGINT, ds ARRAY<BIGINT>). */
  def udaf(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BoundedCollect(cap))
}
