package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Ingestion-throughput harness (round 5): measures events/second
  * through the TWO reference-shaped write paths —
  *
  *  (a) Docker-event pipeline: JSON-lines backlog → EventIngest.start
  *      (normalize → date-partitioned idempotent parquet store);
  *  (b) container-log follower: raw "RFC3339-nano SPACE message" lines
  *      → EventIngest.runCatchUp (parse, uuid-mint, partitioned store).
  *
  * The reference issues ONE SPARQL INSERT round-trip per record
  * (muswarmlogger/loggers.py ≈L50 [C-med] — SURVEY §3.1), an implied
  * ceiling of ~100–1,000 lines/s (BASELINE.md); here each micro-batch
  * lands as one bulk columnar write, so the figure should clear that
  * ceiling by orders of magnitude ON A LAPTOP-SIZED local[*] — and the
  * same pipeline scales out by partitioning, which the per-record
  * HTTP loop cannot.
  *
  * Timing includes query startup, file listing, parse, and the sink's
  * parquet commit — the number is end-to-end backlog drain, not a
  * cherry-picked transform. Backlog generation is NOT timed.
  *
  * Usage: runMain graft.IngestBench [nFiles] [eventsPerFile]
  * Prints one JSON line: {"metric":"ingest_events_per_sec", ...}.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(32)
    val perFile = args.lift(1).map(_.toInt).getOrElse(25000)
    val total = nFiles.toLong * perFile
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Files.createTempDirectory("graft_ingest").toString
    def dir(s: String) = { val p = s"$root/$s"; Files.createDirectories(
      Paths.get(p)); p }

    // -------- backlog generation (untimed) --------
    // Deterministic synthetic Docker events: id drives everything, ts
    // spreads over ~30 days so the date-partitioned sink writes a
    // realistic partition fan-out, not one directory.
    val baseNanos = 1700000000000000000L // 2023-11-14T22:13:20Z
    val events = spark.range(total)
      .select(to_json(struct(
        lit("container").as("Type"),
        element_at(array(lit("start"), lit("die"), lit("health_status"),
          lit("stop")), (col("id") % 4 + 1).cast("int")).as("Action"),
        concat(lit("c"), col("id") % 500).as("id"),
        struct(
          concat(lit("c"), col("id") % 500).as("ID"),
          map(
            lit("image"), concat(lit("img"), col("id") % 20),
            lit("name"), concat(lit("svc"), col("id") % 50),
            lit("com.docker.compose.project"), lit("bench"),
            lit("com.docker.compose.service"),
            concat(lit("svc"), col("id") % 50),
            lit("LOG"), lit("1")).as("Attributes")).as("Actor"),
        (lit(baseNanos / 1000000000L) + col("id") % 2592000).as("time"),
        (lit(baseNanos) + (col("id") % 2592000) * 1000000000L)
          .as("timeNano"))))
      .repartition(nFiles)
    events.write.mode(SaveMode.Overwrite).text(dir("events_src"))

    // Raw follower lines: RFC3339-nano prefix + message, same volume.
    spark.range(total)
      .select(concat(
        date_format(timestamp_micros(lit(baseNanos / 1000L) +
          col("id") % 86400000000L), "yyyy-MM-dd'T'HH:mm:ss"),
        lit("."), lpad((col("id") % 999999999L).cast("string"), 9, "0"),
        lit("Z GET /health "), (col("id") % 3 * 100 + 200).cast("string"))
        .as("value"))
      .repartition(nFiles)
      .write.mode(SaveMode.Overwrite).text(dir("logs_src"))

    // -------- (a) event pipeline: drain the backlog, timed --------
    val t0 = System.nanoTime()
    val q1 = streaming.EventIngest.start(spark, dir("events_src"),
      dir("events_store"), dir("events_ckpt"))
    q1.processAllAvailable(); q1.stop()
    val evSec = (System.nanoTime() - t0) / 1e9
    val evStored = spark.read.parquet(dir("events_store")).count()

    // -------- (b) log follower: drain the backlog, timed --------
    // startLogFollower, not runCatchUp: same parse/uuid/sink path, but
    // without catch-up mode's deliberate 1-file-per-trigger rate limit
    // (which measures micro-batch scheduling overhead, not throughput —
    // reported separately below).
    val t1 = System.nanoTime()
    val q2 = streaming.EventIngest.startLogFollower(spark, dir("logs_src"),
      "bench-container", dir("logs_store"), dir("logs_ckpt"))
    q2.processAllAvailable(); q2.stop()
    val logSec = (System.nanoTime() - t1) / 1e9
    val logStored = spark.read.parquet(dir("logs_store")).count()

    // -------- (c) rate-limited catch-up mode (nFiles micro-batches) ----
    val t2 = System.nanoTime()
    val q3 = streaming.EventIngest.runCatchUp(spark, dir("logs_src"),
      "bench-catchup", dir("catchup_store"), dir("catchup_ckpt"))
    q3.awaitTermination() // AvailableNow terminates after the backlog
    val cuSec = (System.nanoTime() - t2) / 1e9

    require(evStored == total, s"event store rows $evStored != $total")
    require(logStored == total, s"log store rows $logStored != $total")

    def r(d: Double) = math.round(d).toLong
    // Locale.ROOT: default-locale "%.2f" prints "1,23" under comma-
    // decimal locales, which breaks the JSON metric line
    def f2(d: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, d)
    // the headline metric is the slower of the two drain paths — an
    // honest floor (catch-up mode is a per-batch-overhead measurement,
    // not a throughput ceiling, and is excluded from the headline)
    println(s"""{"metric":"ingest_events_per_sec","value":${
      r(math.min(total / evSec, total / logSec))},"unit":"events/sec",""" +
      s""""events_pipeline":{"n":$total,"sec":${f2(evSec)},""" +
      s""""events_per_sec":${r(total / evSec)}},""" +
      s""""log_follower":{"n":$total,"sec":${f2(logSec)},""" +
      s""""events_per_sec":${r(total / logSec)}},""" +
      s""""catchup_rate_limited":{"n":$total,"sec":${
        f2(cuSec)},"events_per_sec":${r(total / cuSec)},""" +
      s""""micro_batches":$nFiles},""" +
      s""""reference_ceiling_events_per_sec":1000}""")
    spark.stop()
  }
}
