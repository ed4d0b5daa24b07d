package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Fixture-contract guards (round 7, VERDICT r6 items 1–3).
  *
  * Round 6 lost 61 correctness rows to ONE silent environment change:
  * the driver regenerated `events.parquet` with `ts` as parquet
  * TIMESTAMP_MICROS where every prior round shipped TIMESTAMP(NANOS),
  * and the reader threw at analysis time for every events consumer.
  * These tests make that class of failure loud and local:
  *
  *  - the analyze-only guard runs `queryExecution.analyzed` on EVERY
  *    enrolled query against the live sf0.001 fixture — any fixture
  *    schema drift fails the suite in seconds, without executing plans;
  *  - the dual-physical-type test pins BOTH branches of
  *    [[Tables.events]] against tiny self-written parquet, so the next
  *    regeneration (either direction) cannot break the reader.
  */
class FixtureSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.catalog.clearCache(); spark.stop() }

  test("schema-drift guard: every enrolled query analyzes against sf0.001") {
    // Analysis resolves every column reference against the live fixture
    // schemas — a renamed/retyped fixture column fails here by name.
    // (Construction cost only: sink rows perform their small writes and
    // eager localCheckpoints run at sf0.001 scale, still seconds total.)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).queryExecution.analyzed; None }
        catch {
          case e: Throwable =>
            Some(s"$name: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    spark.catalog.clearCache()
    assert(failures.isEmpty,
      s"${failures.size} queries no longer analyze:\n${failures.mkString("\n")}")
  }

  test("Tables.events reads both physical ts types with identical semantics") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_events_fixture").toString
    // µs instants incl. a sub-ms fraction and the epoch itself
    val micros = Seq(1700000000000000L, 1700000000123456L, 0L)
    import spark.implicits._
    val base = micros.toDF("us")
    // micros fixture: TIMESTAMP_MICROS isAdjustedToUTC=false — exactly
    // what Spark writes for timestamp_ntz, and what the round-6 driver
    // regeneration produced (reads back as timestamp_ntz)
    base.selectExpr("us as event_id",
        "cast(timestamp_micros(us) as timestamp_ntz) as ts",
        "double(us % 7) as value")
      .write.mode("overwrite").parquet(s"$tmp/micros/events.parquet")
    // nanos fixture: plain INT64 nanos — presents as LongType, the same
    // loaded schema the original TIMESTAMP(NANOS) fixture presents under
    // legacy.parquet.nanosAsLong, so it pins the LongType branch
    base.selectExpr("us as event_id", "us * 1000 as ts",
        "double(us % 7) as value")
      .write.mode("overwrite").parquet(s"$tmp/nanos/events.parquet")

    val em = Tables.events(spark, s"$tmp/micros")
    val en = Tables.events(spark, s"$tmp/nanos")
    for (e <- Seq(em, en)) {
      assert(e.schema("ts").dataType == TimestampType, e.schema.treeString)
      assert(e.schema("ts_ns").dataType == LongType, e.schema.treeString)
    }
    // both branches emit the same column order (downstream positional
    // selects and the ScalaTest frames rely on it being stable)
    assert(em.columns.toSeq == en.columns.toSeq,
      s"${em.columns.toSeq} vs ${en.columns.toSeq}")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.selectExpr("event_id", "ts_ns", "unix_micros(ts)")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val (rm, rn) = (rows(em), rows(en))
    assert(rm == rn, s"branch divergence:\n$rm\n$rn")
    // ts_ns ≡ µs·1000 and ts ≡ the same instant, on both paths
    rm.foreach { case (id, ns, us) =>
      assert(ns == us * 1000L, s"event_id=$id: ts_ns=$ns unix_micros=$us")
      assert(micros.contains(us), s"event_id=$id: unexpected instant $us")
    }
  }

  test("live events fixture exposes ts (timestamp) + ts_ns (long) consistently") {
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType == TimestampType)
    assert(e.schema("ts_ns").dataType == LongType)
    // div-1000 form (round 8, advisor): asserts the two columns are
    // CONSISTENT without pinning µs granularity of the source — a
    // regenerated true TIMESTAMP(NANOS) fixture carrying sub-µs values
    // (the reader's LongType branch exists for exactly that) would
    // satisfy this but fail the old `ts_ns == unix_micros(ts) * 1000`
    val bad = e.filter(org.apache.spark.sql.functions.expr(
      "ts_ns div 1000 != unix_micros(ts)")).count()
    assert(bad == 0L, s"$bad rows where ts_ns div 1000 != unix_micros(ts)")
  }
}
