package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ArrayMean, DotProduct}

/** The SQL-text surface: native functions registered via
  * GraftExtensions, the prediction_dates Generator UDTF, the ArrayMean
  * Aggregator, and the codegen dot_product expression (values checked
  * against the interpreted higher-order-function form).
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  GraftExtensions.install(spark)

  test("dot_product matches the higher-order-function fold exactly") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val got = df.select(
      DotProduct($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (s, v) => s + v).as("hof")).collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(got(0).getDouble(0) == 32.0)
  }

  test("dot_product null propagation") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    assert(df.select(DotProduct($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("dot_matrix is callable from SQL text with a literal matrix") {
    val got = spark.sql(
      "SELECT dot_matrix(array(1d, 2d), " +
        "array(array(3d, 4d), array(1d, 0d))) AS d")
      .as[Seq[Double]].head()
    assert(got == Seq(11.0, 1.0))
  }

  test("dot_product is callable from SQL text") {
    val got = spark.sql(
      "SELECT dot_product(array(1d, 2d), array(3d, 4d)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("approx_count_distinct (the x23 sketch path) is within 5% of exact") {
    // 10k rows over ~2k distinct keys; HLL++ partials merge across
    // partitions, which is why this is the 100 TB path while the
    // oracle-checked x23 query uses exact count_distinct
    val df = spark.range(10000)
      .select((($"id" * 2654435761L) % 2003).as("k"))
    val Seq(exact, approx) = df
      .agg(count_distinct($"k").cast("double"),
        approx_count_distinct($"k", 0.02).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toSeq
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("prediction_dates UDTF explodes annual dates incl. sentinel") {
    val got = spark.sql(
      """SELECT s.pday FROM (
        |  SELECT explode(array(
        |    named_struct('sday', DATE '1980-01-01', 'eday', DATE '1986-06-01'),
        |    named_struct('sday', DATE '0001-01-01', 'eday', DATE '0001-01-01'))) AS seg)
        |LATERAL VIEW prediction_dates(seg.sday, seg.eday, 7, 1) s AS pday
        |ORDER BY s.pday""".stripMargin)
      .select($"pday".cast("string")).as[String].collect()
    // sentinel row first (year 1), then 07-01 of 1980..1985
    assert(got.length == 7)
    assert(got.head == "0001-01-01")
    assert(got.tail.toSeq == (1980 to 1985).map(y => s"$y-07-01"))
  }

  test("minhash_sig and simhash_bits are callable from SQL text") {
    val sig = spark.sql(
      "SELECT minhash_sig(array(5L, 99L, 1234567L), 16) AS s")
      .as[Seq[Long]].head()
    assert(sig.length == 16)
    // component 0: min over h of (3h + 12345) mod p
    assert(sig(0) == Seq(5L, 99L, 1234567L)
      .map(h => (3 * h + 12345) % graft.functions.TextExprs.MinhashP).min)
    val sh = spark.sql(
      "SELECT simhash_bits(array(1L), 16) AS s").as[Long].head()
    assert(sh == 1L) // single hash 1 votes +1 only on bit 0
  }

  test("array_mean aggregator: element-wise mean with partial agg") {
    val df = Seq(
      (1, Seq(1.0, 10.0)), (1, Seq(3.0, 30.0)),
      (2, Seq(5.0, 50.0))).toDF("k", "v").repartition(4)
    val got = df.groupBy($"k").agg(ArrayMean.udaf($"v").as("m"))
      .orderBy($"k").as[(Int, Seq[Double])].collect()
    assert(got(0) == ((1, Seq(2.0, 20.0))))
    assert(got(1) == ((2, Seq(5.0, 50.0))))
  }

  test("registerTables exposes testdata to SQL text") {
    GraftExtensions.registerTables(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) AS n FROM lineitem").as[Long].head()
    assert(n > 5000)
    // native function over a registered view
    val d = spark.sql(
      """SELECT max(dot_product(CAST(embedding AS ARRAY<DOUBLE>),
        |                       CAST(embedding AS ARRAY<DOUBLE>))) AS m
        |FROM embeddings""".stripMargin).as[Double].head()
    assert(d > 0.0)
  }
}
