package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom filter over 64-bit keys: a distributed build aggregator plus a
  * codegen membership probe — the semi-join reduction that keeps a
  * 100 TB anti-join honest. The exact key set may be far too large to
  * broadcast as a join table (100 M 8-byte keys ≈ GBs with row
  * overhead), but its bloom image is ~16 bits/key with fp ≈ 0.24% at
  * k=4, so the big side is pruned to the fp fraction by a pure
  * map-side filter BEFORE the only shuffle, and only the "maybe" rows
  * pay an exact confirm join. Spark's own AQE runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) applies the
  * same idea to planner-chosen joins; this is the explicit,
  * user-directed form for pipelines where the reference set is a
  * separately-built artifact (benchmark decontamination lists, seen-URL
  * sets, opt-out registries).
  *
  * Build and probe share [[Bloom.maybe]] bit addressing (double
  * hashing: `bit_i = (h + i*h2) & (m-1)`, m a power of two), so a key
  * inserted by the aggregator can NEVER be reported absent by the
  * probe — no false negatives by construction, property-pinned in
  * BloomSpec.
  */
object Bloom {

  /** Probes per key. With bits sized at ~16/key, fp ≈ (1-e^(-k/16))^4. */
  val K = 4

  /** Bloom words (64-bit) for an expected key count: ~16 bits per key
    * rounded up to a power of two (so probes are an AND, not a MOD),
    * floor 1024 bits, ceiling 2^32 bits (512 MiB — comfortably under
    * the broadcast limit; past ~1 G keys the fp degrades gracefully
    * rather than the build failing, and the confirm join still keeps
    * results exact). Monotone in n — pinned in BloomSpec.
    */
  def wordsFor(n: Long): Int = {
    val wantBits = math.max(1024L,
      java.lang.Long.highestOneBit(math.max(1L, 16L * n - 1L)) * 2L)
    (math.min(wantBits, 1L << 32) >>> 6).toInt
  }

  /** splitmix64 finalizer: decorrelates the probe positions from the
    * raw key. Without it, both `h & (m-1)` and any multiplicative
    * second hash taken mod the power-of-two m depend only on the key's
    * LOW bits, which clusters probes and was measured to inflate fp
    * 15x over the design point (0.24% -> 3.9% at 16 bits/key). The
    * finalized value splits into two independent 32-bit halves for
    * classic Kirsch-Mitzenmacher double hashing. */
  @inline private[functions] def fmix(x: Long): Long = {
    var h = x
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^= h >>> 31
    h
  }

  /** Set all K bits of `h` in `bits` (mutates). */
  def add(bits: Array[Long], h: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val f = fmix(h)
    val h1 = f & 0xFFFFFFFFL
    val step = (f >>> 32) | 1L
    var i = 0
    while (i < K) {
      val b = (h1 + i * step) & mask
      bits((b >>> 6).toInt) |= 1L << (b & 63L)
      i += 1
    }
  }

  /** Membership probe: false = DEFINITELY absent; true = maybe. */
  def maybe(bits: Array[Long], h: Long): Boolean = {
    val mask = bits.length.toLong * 64L - 1L
    val f = fmix(h)
    val h1 = f & 0xFFFFFFFFL
    val step = (f >>> 32) | 1L
    var i = 0
    while (i < K) {
      val b = (h1 + i * step) & mask
      if ((bits((b >>> 6).toInt) & (1L << (b & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  /** Column-API probe against a driver-built filter (the bit array is a
    * codegen reference object — one copy per executor via the task
    * closure, not per row). */
  def mightContain(bits: Array[Long], hash: Column): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(hash), bits))

  /** Untyped-Column build aggregator: `df.agg(Bloom.agg(words)(hashCol))`
    * yields one `array<bigint>` row. Map-side partial aggregation: each
    * task folds its rows into ONE local bit array and merge is a
    * word-wise OR, so the shuffle ships `words*8` bytes per task
    * regardless of row count.
    */
  def agg(numWords: Int)(hash: Column): Column =
    org.apache.spark.sql.functions.udaf(
      new BloomAgg(numWords), Encoders.scalaLong).apply(hash)

  /** Build aggregator that sizes the filter at FINISH time: the buffer
    * carries the build side's raw 64-bit hashes (the build side is
    * small by contract — a benchmark list, not the corpus) and the
    * final bloom is sized by [[wordsFor]] of the observed key count.
    * One lazy aggregate replaces the count-job-then-build-job pair, so
    * a query can embed the build as an ordinary broadcastable 1-row
    * relation with NO driver-side jobs at plan-construction time — the
    * same laziness contract as a broadcast exchange. The trade: the
    * partial-agg shuffle ships 8 bytes/key instead of fixed-size bit
    * arrays, acceptable exactly when the build side is the small one
    * (use [[agg]] with a precomputed size otherwise). */
  def sizedAgg(hash: Column): Column =
    org.apache.spark.sql.functions.udaf(
      SizedBloomAgg, Encoders.scalaLong).apply(hash)

  /** Column-vs-column probe: bits as an `array<bigint>` COLUMN (e.g.
    * [[sizedAgg]]'s output broadcast-joined as a 1-row relation)
    * instead of a driver-held constant. Same addressing as
    * [[maybe]]/[[BloomMightContain]]. */
  def mightContain(bits: Column, hash: Column): Column =
    ColumnBridge.column(BloomMightContainCol(
      ColumnBridge.expression(bits), ColumnBridge.expression(hash)))
}

/** Mutable build buffer (case class so Encoders.product applies). */
final case class BloomBuf(var bits: Array[Long])

/** Growable hash buffer for the sized-at-finish build. */
final case class BloomKeysBuf(var ks: Array[Long], var n: Int)

/** Sized-at-finish bloom build: buffer the raw hashes, size the bit
  * array from the observed count only when the aggregate finishes. */
object SizedBloomAgg extends Aggregator[Long, BloomKeysBuf, Array[Long]] {

  /** Enforced form of the small-build-side contract: the buffer holds
    * raw 8 B/key hashes, so a caller pointing this at a LARGE side
    * would grow buffers toward executor OOM — fail fast with a pointer
    * to the fixed-size [[Bloom.agg]] instead. 1<<24 keys = 128 MB per
    * buffer, far above any sane build list and far below heap;
    * overridable for tests / unusual deployments. */
  private[graft] val MaxKeys: Int =
    sys.props.getOrElse("graft.bloom.sizedMaxKeys", (1 << 24).toString).toInt

  private def guard(n: Int): Unit =
    require(n <= MaxKeys,
      s"SizedBloomAgg buffered $n keys (cap $MaxKeys): the sized-at-" +
        "finish build is for SMALL build sides; use Bloom.agg(numWords) " +
        "with a precomputed size for large ones " +
        "(-Dgraft.bloom.sizedMaxKeys overrides the cap)")

  override def zero: BloomKeysBuf = BloomKeysBuf(new Array[Long](16), 0)

  override def reduce(b: BloomKeysBuf, h: Long): BloomKeysBuf = {
    guard(b.n + 1)
    if (b.n == b.ks.length)
      b.ks = java.util.Arrays.copyOf(b.ks, b.ks.length * 2)
    b.ks(b.n) = h; b.n += 1; b
  }

  override def merge(x: BloomKeysBuf, y: BloomKeysBuf): BloomKeysBuf = {
    guard(x.n + y.n)
    val out = java.util.Arrays.copyOf(x.ks, x.n + y.n)
    System.arraycopy(y.ks, 0, out, x.n, y.n)
    BloomKeysBuf(out, x.n + y.n)
  }

  override def finish(b: BloomKeysBuf): Array[Long] = {
    val bits = new Array[Long](Bloom.wordsFor(b.n.toLong))
    var i = 0
    while (i < b.n) { Bloom.add(bits, b.ks(i)); i += 1 }
    bits
  }

  override def bufferEncoder: Encoder[BloomKeysBuf] =
    Encoders.product[BloomKeysBuf]
  override def outputEncoder: Encoder[Array[Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Array[Long]]()
  }
}

/** Distributed bloom build over 64-bit hash keys. */
final class BloomAgg(numWords: Int)
    extends Aggregator[Long, BloomBuf, Array[Long]] {

  override def zero: BloomBuf = BloomBuf(new Array[Long](numWords))

  override def reduce(b: BloomBuf, h: Long): BloomBuf = {
    Bloom.add(b.bits, h); b
  }

  override def merge(x: BloomBuf, y: BloomBuf): BloomBuf = {
    var i = 0
    while (i < x.bits.length) { x.bits(i) |= y.bits(i); i += 1 }
    x
  }

  override def finish(b: BloomBuf): Array[Long] = b.bits

  override def bufferEncoder: Encoder[BloomBuf] = Encoders.product[BloomBuf]
  override def outputEncoder: Encoder[Array[Long]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Array[Long]]()
  }
}

/** Codegen probe: `bloom_might_contain(hash)` over a CONSTANT bit
  * array. The array lives in the generated class as a reference object
  * (like [[DotMatrix]]'s matrix) — never serialized per row, and the
  * k-probe loop stays inside whole-stage codegen so the pre-shuffle
  * prune is a tight branchy loop over L1-resident words for any
  * realistically-hot filter.
  */
case class BloomMightContain(child: Expression, bits: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint input, got ${other.simpleString}")
  }

  override def nullSafeEval(h: Any): Any =
    Bloom.maybe(bits, h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val arr = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val mask = bits.length.toLong * 64L - 1L
      val f = ctx.freshName("f")
      val h1 = ctx.freshName("h1")
      val step = ctx.freshName("step")
      val bit = ctx.freshName("bit")
      val i = ctx.freshName("i")
      val ok = ctx.freshName("ok")
      // identical splitmix64 + double-hash addressing as Bloom.fmix/
      // Bloom.maybe — build and probe must agree bit for bit
      s"""
         |boolean $ok = true;
         |long $f = $h;
         |$f ^= $f >>> 30; $f *= 0xbf58476d1ce4e5b9L;
         |$f ^= $f >>> 27; $f *= 0x94d049bb133111ebL;
         |$f ^= $f >>> 31;
         |long $h1 = $f & 0xFFFFFFFFL;
         |long $step = ($f >>> 32) | 1L;
         |for (int $i = 0; $i < ${Bloom.K}; $i++) {
         |  long $bit = ($h1 + $i * $step) & ${mask}L;
         |  if (($arr[(int)($bit >>> 6)] & (1L << (int)($bit & 63L))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  // keep explain/toString small: never print the bit payload
  override def toString: String =
    s"bloom_might_contain($child, <${bits.length * 64} bits>)"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen probe against an `array<bigint>` bit COLUMN (vs
  * [[BloomMightContain]]'s driver constant): the bits arrive per row —
  * in practice one broadcast-joined row shared by every probe — and the
  * k-probe loop reads words straight off the columnar ArrayData, no
  * per-row array copy. Addressing is identical to [[Bloom.maybe]]. */
case class BloomMightContainCol(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (array<bigint>, bigint), got " +
          s"${other._1.simpleString}, ${other._2.simpleString}")
    }

  override def nullSafeEval(b: Any, h: Any): Any = {
    val arr = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    Bloom.maybe(arr.toLongArray(), h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => {
      val mask = ctx.freshName("mask")
      val f = ctx.freshName("f")
      val h1 = ctx.freshName("h1")
      val step = ctx.freshName("step")
      val bit = ctx.freshName("bit")
      val i = ctx.freshName("i")
      val ok = ctx.freshName("ok")
      // identical splitmix64 + double-hash addressing as Bloom.fmix/
      // Bloom.maybe — build and probe must agree bit for bit
      s"""
         |boolean $ok = true;
         |long $mask = (long) $b.numElements() * 64L - 1L;
         |long $f = $h;
         |$f ^= $f >>> 30; $f *= 0xbf58476d1ce4e5b9L;
         |$f ^= $f >>> 27; $f *= 0x94d049bb133111ebL;
         |$f ^= $f >>> 31;
         |long $h1 = $f & 0xFFFFFFFFL;
         |long $step = ($f >>> 32) | 1L;
         |for (int $i = 0; $i < ${Bloom.K}; $i++) {
         |  long $bit = ($h1 + $i * $step) & $mask;
         |  if (($b.getLong((int)($bit >>> 6)) & (1L << (int)($bit & 63L))) == 0L) {
         |    $ok = false; break;
         |  }
         |}
         |${ev.value} = $ok;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
