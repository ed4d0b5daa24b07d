package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table readers for the driver-generated parquet fixtures
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md).
  *
  * Scale notes (100 TB design): every reader is a plain parquet scan, so
  * Catalyst's column pruning + predicate pushdown reach the source; no
  * caching or driver-side materialization happens here. At cluster scale
  * these paths would be partitioned directories — the API is unchanged.
  */
object Tables {

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.parquet` carries a parquet TIMESTAMP(NANOS) `ts` column which
    * Spark 4.x refuses to read by default ([PARQUET_TYPE_ILLEGAL], see
    * SURVEY.md §7.3-1). We read nanos as a long (`ts_ns`) and derive a
    * µs-precision timestamp `ts` via integer division (`div`, not `/`,
    * to avoid double-precision loss on 1.7e18-scale nanos).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
  }
}
