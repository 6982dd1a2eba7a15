package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Core relational operator surface (SURVEY.md §2.2–§2.8) expressed over
  * the driver testdata. Each query has a DuckDB oracle in [[Relational.oracle]]
  * with identical column names/aliases (the driver hash-compares by sorted
  * column name).
  *
  * Scale notes: aggregate results are rounded where they sum doubles (Spark
  * and DuckDB may differ in the last ulp under different summation orders);
  * dimension joins (region/nation) are broadcast; all scans rely on Catalyst
  * predicate pushdown + column pruning into the parquet reader.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** Flagship: TPC-H Q1-style pricing summary (SURVEY §2.4; partial/final
    * agg split + whole-stage codegen come free from Catalyst).
    */
  val q1Agg: Q = (s, d) =>
    lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val registry: Map[String, Q] = Map(
    "q1_agg" -> q1Agg
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
