package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.StringToColumn
import graft.functions.DateExprs._

/** SURVEY §2.8 scalar/date functions (C1, C2/C3, C5, C9) exercised over
  * the driver testdata so the DuckDB oracle verifies the exact semantics
  * (ordinal epoch 0001-01-01, interval-filtered annual explode, ...).
  */
object DateOps {

  val qs: Map[String, Q] = Map(
    // ----- C5 ordinal <-> ISO round trip (Python date.toordinal semantics)
    "c5_ordinal" -> Q(
      """SELECT o_orderkey,
        |  date_diff('day', DATE '0001-01-01', CAST(o_orderdate AS DATE)) + 1
        |    AS ord,
        |  DATE '0001-01-01'
        |    + CAST(date_diff('day', DATE '0001-01-01',
        |        CAST(o_orderdate AS DATE)) AS INTEGER)
        |    AS roundtrip
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val d = to_date($"o_orderdate")
      Tables(s, dir, "orders")
        .select($"o_orderkey",
          ordinalOf(d).cast("long").as("ord"),
          dateFromOrdinal(ordinalOf(d)).as("roundtrip"))
        .orderBy($"o_orderkey")
    },

    // ----- C1 average reflectance: intercept + slope * ordinal(date).
    // slope*ordinal keeps 2 intrinsic decimals -> round(4) is boundary-safe.
    "c1_avg_reflectance" -> Q(
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice + l_discount *
        |    (date_diff('day', DATE '0001-01-01', CAST(l_shipdate AS DATE)) + 1),
        |    4) AS ar
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) {
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber",
            round(
              $"l_extendedprice" +
                $"l_discount" * ordinalOf(to_date($"l_shipdate"))
                  .cast("double"), 4).as("ar"))
          .orderBy($"l_orderkey", $"l_linenumber")
    },

    // ----- C2+C3 annual prediction-date explode: one row per year-07-01
    // inside [sday, eday] (sday = orderdate, eday = orderdate + 4 years)
    "c3_explode_dates" -> Q(
      """WITH base AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS sday,
        |    CAST(o_orderdate AS DATE) + 1460 AS eday
        |  FROM orders),
        |expl AS (
        |  SELECT o_orderkey, sday, eday,
        |    unnest(generate_series(CAST(year(sday) AS INT),
        |      CAST(year(eday) AS INT))) AS y
        |  FROM base)
        |SELECT o_orderkey, sday, eday, make_date(y, 7, 1) AS pday
        |FROM expl
        |WHERE make_date(y, 7, 1) BETWEEN sday AND eday
        |ORDER BY o_orderkey, pday""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select($"o_orderkey", to_date($"o_orderdate").as("sday"))
        .withColumn("eday", date_add($"sday", 1460))
        .withColumn("pday", predictionDates($"sday", $"eday", 7, 1))
        .orderBy($"o_orderkey", $"pday")
    },

    // ----- C9 normalized-burn-ratio-shaped arithmetic: (a-b)/(a+b)
    "c9_nbr" -> Q(
      """SELECT p_partkey,
        |  round((p_retailprice - p_size) / (p_retailprice + p_size), 6)
        |    AS nbr
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .select($"p_partkey",
          round(nbr($"p_retailprice", $"p_size".cast("double")), 6).as("nbr"))
        .orderBy($"p_partkey")
    })
}
