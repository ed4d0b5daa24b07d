package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2-D — aggregation operators.
  *
  * All queries end in a total-order sort with rounded doubles so the
  * driver's DuckDB hash-compare is deterministic (SURVEY §7.4).
  *
  * Scale notes: every aggregation here is a hash aggregate with map-side
  * partial aggregation (Spark plans partial+final automatically); no
  * `collect()` anywhere; grouping keys are low-cardinality so the final
  * shuffle is tiny regardless of input scale.
  */
object Aggregates {

  /** Flagship — TPC-H Q1 pricing summary clone.
    * Reference analog: the daily/char rollups the mu-swarm-logger's
    * triplestore consumers run over collected events (SURVEY §0.5).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_pricing_summary" -> pricingSummary,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
