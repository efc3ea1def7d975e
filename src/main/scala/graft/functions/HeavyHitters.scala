package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary as a typed Aggregator — the
  * bounded-state candidate phase of exact distributed heavy hitters
  * (x89). The buffer holds AT MOST k counters no matter the key
  * cardinality: a new key with no free slot triggers the classical
  * decrement round (subtract the minimum counter from every counter,
  * discard zeros), and partial buffers merge by replaying one side's
  * counters into the other. Each decrement round retires δ·(k+1)
  * stream occurrences, so any key with true count > n/(k+1) is
  * GUARANTEED to survive in the final map (the Misra–Gries superset
  * property, preserved under arbitrary merge order — the "mergeable
  * summaries" result). Counts in the map are lower bounds
  * (undercount ≤ n/(k+1)), which is why x89 follows with an exact
  * recount of the ≤ k candidates rather than reporting them.
  *
  * At 100 TB: a groupBy-count over an unbounded key space spills its
  * partial hash maps; this buffer cannot — state is k entries per
  * partial, the merge tree ships k-entry maps, and the only thing the
  * second (exact) pass shuffles is the candidate slice, map-side
  * combined to ≤ k rows per task.
  */
final case class MgBuf(var m: Map[String, Long])

final class MisraGries(k: Int)
    extends Aggregator[String, MgBuf, Map[String, Long]] {
  require(k >= 2, s"Misra-Gries needs k >= 2, got $k")

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, x: String): MgBuf = add(b, x, 1L)

  /** Add `c` occurrences of `x` under the k-entry invariant. */
  private def add(b: MgBuf, x: String, c: Long): MgBuf = {
    val cur = b.m.getOrElse(x, 0L)
    if (cur > 0L || b.m.size < k) {
      b.m = b.m.updated(x, cur + c)
      b
    } else {
      // decrement round: δ = min(smallest counter, c) comes off every
      // counter AND off x's pending count; zeros vacate their slots
      val minC = b.m.valuesIterator.min
      val delta = math.min(minC, c)
      b.m = b.m.collect {
        case (w, v) if v > delta => w -> (v - delta)
      }
      val rem = c - delta
      if (rem > 0L) add(b, x, rem) else b
    }
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    // replay the smaller side's counters — same invariant, same
    // guarantee (error stays ≤ n/(k+1) under any merge tree)
    val (into, from) = if (a.m.size >= b.m.size) (a, b) else (b, a)
    from.m.foreach { case (w, v) => add(into, w, v) }
    into
  }

  override def finish(b: MgBuf): Map[String, Long] = b.m

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Map[String, Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Map[String, Long]]()
  }
}

object MisraGries {
  /** Untyped-Column form for DataFrame `agg`. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MisraGries(k))
}
