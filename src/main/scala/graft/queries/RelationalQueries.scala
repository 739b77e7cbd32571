package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import QueryDefs._

/** Q15–Q18 — star-schema relational surface (joins the reference never had,
  * required by the harness: SURVEY §2.3). Classic TPC-H-shaped pipelines
  * over the driver testdata, written so Catalyst gets the plan it wants:
  * filters sit directly on scans (pushed into Parquet), small dimensions are
  * broadcast, money sums are exact DECIMAL(18,2).
  */
object RelationalQueries {

  /** Q15 — pricing summary (TPC-H Q1 shape): wide hash-aggregate with
    * map-side partials; the shipdate filter is pushed to the Parquet scan.
    */
  private def q15(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(money(col("l_extendedprice"))).as("sum_base_price"),
        moneySum(discPrice(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        r6(avg(col("l_quantity"))).as("avg_qty"),
        r6(avg(col("l_extendedprice"))).as("avg_price"),
        r6(avg(col("l_discount"))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q15Sql =
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= DATE '1998-12-01'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Q16 — shipping-priority top-N (TPC-H Q3 shape): two joins where the
    * filtered customer side broadcasts, then TakeOrderedAndProject.
    */
  private def q16(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("date"))
    val li   = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("date"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), dayStr(col("o_orderdate")).as("o_orderdate"))
      .agg(moneySum(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q16Sql =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-01-01'
      |  AND l_shipdate > DATE '1998-01-01'
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** Q17 — local-supplier volume (TPC-H Q5 shape): five-way join; every
    * dimension side is broadcast, only lineitem⋈orders shuffles.
    */
  private def q17(spark: SparkSession, dir: String): DataFrame = {
    val asia = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nat  = Tables.nation(spark, dir)
    val sup  = Tables.supplier(spark, dir)
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
              col("o_orderdate") <  lit("1997-01-01").cast("date"))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q17Sql =
    """SELECT n_name,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  /** Q18 — part rollup: fact ⋈ broadcast(part), grouped by brand. */
  private def q18(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("line_count"),
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(discPrice(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        r6(avg(col("p_retailprice"))).as("avg_retail"))
      .orderBy("p_brand")

  private val q18Sql =
    """SELECT p_brand,
      |       count(*) AS line_count,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      |       round(avg(p_retailprice), 6) AS avg_retail
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q15_pricing_summary", q15, Some(q15Sql)),
    QueryDef("q16_top_orders", q16, Some(q16Sql)),
    QueryDef("q17_nation_volume", q17, Some(q17Sql)),
    QueryDef("q18_brand_rollup", q18, Some(q18Sql)))
}
