package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{DotMatrix, DotProduct}

class DotMatrixSpec extends AnyFunSuite with SparkSpec {

  private val m: Array[Array[Double]] =
    Array(Array(1.0, 2.0, 3.0), Array(-0.5, 0.25, 4.0), Array(0.0, 0.0, 0.0))

  test("dot_matrix row r equals dot_product against matrix row r") {
    import spark.implicits._
    val df = Seq(Seq(1.5, -2.0, 0.75), Seq(0.0, 1.0, 1e9)).toDF("v")
      .withColumn("dm", DotMatrix($"v", m))
    val rows = df.select(
      $"dm",
      array(m.indices.map(r => DotProduct($"v", typedLit(m(r)))): _*)
        .as("dp"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (dm, dp) => assert(dm == dp) } // bit-exact
  }

  test("null input yields null; shorter vector folds the overlap only") {
    import spark.implicits._
    val df = Seq(Some(Seq(2.0)), None).toDF("v")
      .withColumn("dm", DotMatrix($"v", m))
    val out = df.select($"dm").as[Option[Seq[Double]]].collect()
    assert(out(0).contains(Seq(2.0, -1.0, 0.0)))
    assert(out(1).isEmpty)
  }
}
