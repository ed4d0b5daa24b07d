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

  /** SIZE-GATED broadcast variants of the SCALING dimension tables
    * (round-10 sweep, VERDICT r9 #2): part/supplier/customer grow
    * linearly with SF in TPC-H-style scaling, so a forced broadcast is
    * the classic dim pattern on the fixture and an executor-memory
    * wall at 100× — the hint applies only while the table's row count
    * (one memoized count job per session — a parquet footer read) sits
    * under [[Hints.NodeRowCap]]; past it the keyed join co-partitions.
    * `region`/`nation` keep plain `broadcast()` at call sites: their
    * cardinality is fixed by the schema spec (5/25 rows at EVERY SF),
    * not by the data volume. */
  private def dimB(s: SparkSession, d: String, name: String): DataFrame =
    Hints.bcastIfAtMost(t(s, d, name),
      FrameMemo.cachedCount(s, d, s"$name-rows")(t(s, d, name)),
      // Full dim rows carry strings (name/address/comment): gate on a
      // measured-conservative ~256 B/row, not the narrow 24 B default
      // (round 11, ADVICE r10 — the byte-aware gate).
      avgRowBytes = 256L)
  def partB(s: SparkSession, d: String): DataFrame = dimB(s, d, "part")
  def supplierB(s: SparkSession, d: String): DataFrame =
    dimB(s, d, "supplier")
  def customerB(s: SparkSession, d: String): DataFrame =
    dimB(s, d, "customer")

  /** `events.parquet` has shipped with two physical types for `ts` across
    * fixture regenerations, so this reader adapts to the loaded schema:
    *
    *  - parquet TIMESTAMP(NANOS): Spark 4.x refuses to read it by default
    *    ([PARQUET_TYPE_ILLEGAL], SURVEY.md §7.3-1); with
    *    `legacy.parquet.nanosAsLong` the column arrives as LongType nanos.
    *    We keep the raw nanos as `ts_ns` and derive a µs-precision `ts`
    *    via integer division (`div`, not `/`, to avoid double-precision
    *    loss on 1.7e18-scale nanos).
    *  - parquet TIMESTAMP_MICROS (isAdjustedToUTC=false → `timestamp_ntz`):
    *    `ts` is cast to a session-TZ timestamp and `ts_ns` is reconstructed
    *    as `unix_micros(ts) * 1000` — identical downstream semantics (the
    *    DuckDB oracles use `epoch_ns(ts)`, which is µs-granular too).
    *
    * The session timezone is pinned to UTC here (not only in the entry
    * mains) so the NTZ→TZ cast is wall-clock identity in every session,
    * including ScalaTest ones; a non-UTC default would silently shift
    * timestamps and break hash parity with the oracle.
    *
    * Both branches emit the same column order: original columns with `ts`
    * in place (as TimestampType), plus `ts_ns` (LongType) appended.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
          .withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
}
