package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("saltedJoin equals the plain equi-join on a skewed key") {
    import spark.implicits._
    // 90% of rows on one hot key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")
    val small = Seq(("hot", 100L), ("k0", 1L), ("k3", 3L)).toDF("k", "w")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v" * $"w").as("s"))
        .orderBy($"k")
        .collect().toSeq
    assert(canon(Skew.saltedJoin(big, small, "k")) ===
      canon(big.join(small, "k")))
  }

  test("saltedJoin drops keys absent from the small side (inner join)") {
    import spark.implicits._
    val big = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val small = Seq(("a", 10L)).toDF("k", "w")
    val out = Skew.saltedJoin(big, small, "k").select($"k").as[String]
      .collect().toSeq
    assert(out == Seq("a"))
  }
}
