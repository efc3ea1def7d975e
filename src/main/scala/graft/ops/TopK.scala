package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Ascending, Expression,
  SortOrder}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-API surface for the [[graft.plans.TopKPerKey]] operator:
  * `TopK.perKey(df, keys, orders, k)` ≡
  * `df.withColumn("rn", row_number over (partitionBy keys orderBy
  * orders)).filter(rn <= k)` — same rows, same `rn` values (callers
  * supply a TOTAL order, the engine convention) — but planned as
  * partial-heap → exchange → exact-final, so the shuffle carries at
  * most keys·k rows per input partition instead of the entire
  * candidate set. TopKSpec pins both the equality and the shuffle
  * reduction.
  */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    require(keys.nonEmpty, "perKey needs at least one key column")
    // self-registering: sessions built without the graft extensions
    // (spark.sql.extensions) still plan the node. The check-then-add
    // synchronizes on the experimental-methods holder so concurrent
    // builders can't append the strategy twice (planning tolerates a
    // duplicate, but global session state should not accrete them).
    val exp = df.sparkSession.experimental
    exp.synchronized {
      if (!exp.extraStrategies.contains(graft.plans.TopKStrategy))
        exp.extraStrategies ++= Seq(graft.plans.TopKStrategy)
    }
    val analyzed = df.queryExecution.analyzed
    val attrs = analyzed.output
    def attr(n: String) = attrs.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$n' in [${attrs.map(_.name).mkString(", ")}]"))
    def resolve(e: Expression): Expression = e.transformUp {
      case u: UnresolvedAttribute => attr(u.name)
    }
    val orders = orderBy.map { c =>
      ColumnBridge.expressionFor(df.sparkSession, c) match {
        case so: SortOrder => resolve(so).asInstanceOf[SortOrder]
        case e => SortOrder(resolve(e), Ascending)
      }
    }
    // normalize float/double grouping keys (0.0 == -0.0, canonical
    // NaN) — the builder bypasses the optimizer batch that would do
    // this for a Window, and the heap groups by key BYTES
    ColumnBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerKey(
        keys.map(n => ColumnBridge.normalizeFloats(attr(n))),
        orders, k, analyzed))
  }
}
