package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native single-pass MinHash signature over pre-hashed shingles.
  *
  * Semantically identical to `sig` independent
  * `array_min(transform(hs, h => (a_i*h + b_i) % p))` passes
  * ([[TextExprs.minhash]], ref MinHash banding per SURVEY §7.5) but one
  * codegen loop: each 48-bit-mod-p shingle hash is loaded ONCE and
  * updates all `sig` minima in registers. The higher-order-function form
  * evaluates an interpreted lambda per (element x component) —
  * `sig`x the element loads and ~100x the per-element overhead — which
  * is the difference between the LSH signature stage being scan-bound
  * vs CPU-bound at 100 TB.
  *
  * Returns null for an empty shingle array (as `array_min` of an empty
  * transform would).
  */
case class MinHashSig(child: Expression, sig: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  private lazy val as: Array[Long] =
    (0 until sig).map(TextExprs.minhashA).toArray
  private lazy val bs: Array[Long] =
    (0 until sig).map(TextExprs.minhashB).toArray

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val mins = Array.fill(sig)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < sig) {
        val m = (as(i) * h + bs(i)) % TextExprs.MinhashP
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$sig];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $hs.getLong($j);
         |    for (int $i = 0; $i < $sig; $i++) {
         |      long $m = ($aRef[$i] * $h + $bRef[$i]) % ${TextExprs.MinhashP}L;
         |      if ($m < $mins[$i]) $mins[$i] = $m;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def apply(hashedArr: Column, sig: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashedArr), sig))
}

/** Native single-pass SimHash over pre-hashed tokens: bit b of the
  * result is set iff the sum over tokens of `2*bit_b(h) - 1` is
  * positive. One loop over the hash array maintains all `bits` vote
  * counters (vs `bits` interpreted `aggregate` passes, each re-reading
  * the array). Empty input yields signature 0 (no positive votes) —
  * matching the fold-from-zero semantics of the HOF form.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Long](bits)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) & 1L) * 2 - 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val votes = ctx.freshName("votes")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |long[] $votes = new long[$bits];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $hs.getLong($j);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += (($h >> $b) & 1L) * 2 - 1;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  def apply(hashedArr: Column, bits: Int): Column =
    ColumnBridge.column(SimHashBits(ColumnBridge.expression(hashedArr), bits))
}
