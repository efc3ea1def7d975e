package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Bloom, BloomKeysBuf, SizedBloomAgg}

/** Bloom filter contract (functions.Bloom): the build/probe pair that
  * makes x31's decontamination anti-join exact — a key that was added
  * can never probe absent — and the sizing curve that keeps the filter
  * broadcastable at any corpus size.
  */
class BloomSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def keys(seed: Long, n: Int): Array[Long] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextLong())
  }

  test("no false negatives: every added key probes maybe-present") {
    val ks = keys(1, 10000)
    val bits = new Array[Long](Bloom.wordsFor(ks.length))
    ks.foreach(Bloom.add(bits, _))
    assert(ks.forall(Bloom.maybe(bits, _)))
  }

  test("false positive rate on disjoint keys stays near the design " +
    "point (~0.24% at 16 bits/key, k=4)") {
    val ins = keys(2, 10000)
    val bits = new Array[Long](Bloom.wordsFor(ins.length))
    ins.foreach(Bloom.add(bits, _))
    val probes = keys(3, 20000)
    val fp = probes.count(Bloom.maybe(bits, _)).toDouble / probes.length
    assert(fp < 0.005, s"fp rate $fp")
  }

  test("wordsFor is monotone, power-of-two, floored and capped") {
    val ns = Seq(0L, 1L, 100L, 10000L, 1000000L, 100000000L,
      10000000000L, 1000000000000L)
    val ws = ns.map(Bloom.wordsFor)
    assert(ws == ws.sorted, s"not monotone: $ws")
    assert(ws.forall(w => Integer.bitCount(w) == 1), s"not pow2: $ws")
    assert(ws.head == 16) // 1024-bit floor
    assert(ws.last == ((1L << 32) >>> 6).toInt) // 2^32-bit cap
    // ~16 bits/key in the unclamped middle
    assert(Bloom.wordsFor(1000000L) * 64L >= 16L * 1000000L)
  }

  test("the distributed build + codegen probe agree with the local " +
    "add/maybe pair bit for bit") {
    val ks = keys(4, 2000).toSeq
    val words = Bloom.wordsFor(ks.length)
    // distributed build: partial buffers per partition, OR-merged
    val built = ks.toDF("h").repartition(8)
      .agg(Bloom.agg(words)($"h").as("b"))
      .head().getSeq[Long](0).toArray
    val local = new Array[Long](words)
    ks.foreach(Bloom.add(local, _))
    assert(java.util.Arrays.equals(built, local))
    // codegen probe: inserted keys all true; disjoint mostly false
    val probes = ks ++ keys(5, 2000).toSeq
    val out = probes.toDF("h")
      .select($"h", Bloom.mightContain(built, $"h").as("m"))
      .as[(Long, Boolean)].collect().toMap
    assert(ks.forall(out(_)))
    val fp = keys(5, 2000).count(out(_)).toDouble / 2000
    assert(fp < 0.005, s"fp rate $fp")
  }

  test("the sized-at-finish build matches the two-pass build bit for " +
    "bit, and the column probe agrees with the constant probe") {
    val ks = keys(6, 3000).toSeq
    // one lazy aggregate, sized from the observed count at finish
    val sized = ks.toDF("h").repartition(8)
      .agg(Bloom.sizedAgg($"h").as("b"))
      .head().getSeq[Long](0).toArray
    val local = new Array[Long](Bloom.wordsFor(ks.length.toLong))
    ks.foreach(Bloom.add(local, _))
    assert(java.util.Arrays.equals(sized, local))
    // column-vs-column probe (the broadcast-joined 1-row shape)
    val probes = ks ++ keys(7, 2000).toSeq
    val bitsDf = ks.toDF("h").agg(Bloom.sizedAgg($"h").as("bb"))
    val out = probes.toDF("h")
      .crossJoin(org.apache.spark.sql.functions.broadcast(bitsDf))
      .select($"h", Bloom.mightContain($"bb", $"h").as("m"))
      .as[(Long, Boolean)].collect().toMap
    assert(ks.forall(out(_)), "column probe reported an added key absent")
    val expect = probes.map(h => h -> Bloom.maybe(local, h)).toMap
    assert(out == expect, "column probe diverged from local maybe()")
  }

  test("the sized build enforces its small-build-side contract: " +
    "exceeding the key cap fails fast instead of growing toward OOM") {
    // buffers with a CLAIMED count at the cap trip the guard without
    // allocating cap-sized arrays — the guard fires before any growth
    val full = BloomKeysBuf(new Array[Long](4), SizedBloomAgg.MaxKeys)
    val one = BloomKeysBuf(new Array[Long](4), 1)
    val e1 = intercept[IllegalArgumentException](
      SizedBloomAgg.reduce(full, 42L))
    assert(e1.getMessage.contains("Bloom.agg"),
      "error must point callers at the fixed-size build")
    intercept[IllegalArgumentException](SizedBloomAgg.merge(full, one))
    // under the cap both paths still work
    val ok = SizedBloomAgg.reduce(SizedBloomAgg.zero, 7L)
    assert(SizedBloomAgg.merge(ok, SizedBloomAgg.zero).n == 1)
  }
}
