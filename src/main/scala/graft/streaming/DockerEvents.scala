package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-shaped ingestion schemas and parsers.
  *
  * The reference consumes two record shapes (SURVEY §1.1):
  *  (a) Docker Engine events — chunked JSON from `GET /events`
  *      (muswarmlogger/main.py event pump; public Docker API shape);
  *  (b) container log lines — `GET /containers/{id}/logs?timestamps=1`,
  *      "RFC3339-nano timestamp SPACE message"
  *      (muswarmlogger/loggers.py save_container_logs).
  *
  * Here both arrive as files of lines (the harness has no Docker socket);
  * the parse/enrich logic is identical for any line-oriented source. At
  * cluster scale the same code runs over a Kafka source — only the
  * `readStream.format` changes.
  */
object DockerEvents {

  /** Public Docker Engine API event shape (SURVEY §1.1a). */
  val eventSchema: StructType = StructType(Seq(
    StructField("Type", StringType),
    StructField("Action", StringType),
    StructField("id", StringType),
    StructField("Actor", StructType(Seq(
      StructField("ID", StringType),
      StructField("Attributes", MapType(StringType, StringType))))),
    StructField("time", LongType),
    StructField("timeNano", LongType)))

  /** Flatten a raw Docker-event DataFrame into the queryable shape:
    * opt-in marker (LOG label), compose project/service labels, and a
    * µs-precision timestamp from timeNano (Spark timestamps are µs —
    * SURVEY §7.3-1). */
  def normalizeEvents(raw: DataFrame): DataFrame =
    raw.select(
      col("Type").as("kind"),
      col("Action").as("action"),
      col("id").as("container_id"),
      col("Actor.Attributes").getItem("image").as("image"),
      col("Actor.Attributes").getItem("name").as("name"),
      col("Actor.Attributes").getItem("com.docker.compose.project")
        .as("project"),
      col("Actor.Attributes").getItem("com.docker.compose.service")
        .as("service"),
      // no Attributes map ⇒ not opted in (false, not NULL — a NULL here
      // silently vanishes from negated filters like !log_opt_in)
      coalesce(map_contains_key(col("Actor.Attributes"), "LOG"), lit(false))
        .as("log_opt_in"),
      expr("timestamp_micros(timeNano div 1000)").as("ts"))

  /** Streaming file source of Docker-event JSON lines. Unparseable lines
    * are dropped (the reference skips lines it can't decode; an all-NULL
    * row in the store would poison downstream rollups). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    normalizeEvents(spark.readStream.schema(eventSchema)
      .option("mode", "DROPMALFORMED").json(dir))

  /** LIVE socket source of Docker-event JSON lines — the executable
    * twin of the reference's event pump (`GET /events` over the Docker
    * socket streams chunked JSON; muswarmlogger/main.py). The sandbox
    * has no Docker daemon, so the listening end is any line-delimited
    * JSON emitter over TCP (a ServerSocket in StreamingSpec) — the parse
    * + normalize pipeline is byte-identical to the file-stream twin.
    * For the daemon's REAL transport — `/var/run/docker.sock` with
    * HTTP chunked framing — use [[HttpChunkedBridge.startUnix]], which
    * dials AF_UNIX natively (JDK 16+) and lands replayable files.
    *
    * Spark's `socket` source is a dev/test source (no offset
    * replay — a crash loses in-flight lines); the production swap is
    * `format("kafka")` with the SAME downstream pipeline, documented
    * at SURVEY §3.2. Malformed lines parse to a NULL struct and are
    * dropped, like the file twin's DROPMALFORMED. */
  def readEventSocketStream(spark: SparkSession, host: String,
      port: Int): DataFrame =
    normalizeEvents(
      spark.readStream.format("socket")
        .option("host", host).option("port", port).load()
        .select(from_json(col("value"), eventSchema).as("e"))
        .filter(col("e").isNotNull && col("e.Type").isNotNull)
        .select(col("e.*")))

  /** Parse raw container log lines ("2024-01-01T00:00:00.123456789Z GET
    * /health 200"): split on first space, RFC3339-nano prefix → µs
    * timestamp, mint a deterministic uuid per line (the reference mints
    * mu:uuid per log resource, muswarmlogger/loggers.py ≈L45; we use a
    * sha-based id so replays are idempotent, unlike uuid1). */
  def parseLogLines(raw: DataFrame, containerId: String): DataFrame =
    raw.select(
      lit(containerId).as("container_id"),
      substring_index(col("value"), " ", 1).as("ts_raw"),
      expr("substring(value, instr(value, ' ') + 1)").as("line"))
      // try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4
      // default) one malformed line would otherwise throw and KILL the
      // whole follower query. Unparseable lines are dropped below, as
      // the reference skips lines it can't split.
      //
      // RFC3339-nano fractions are 1–9 digits (Docker emits 9; a bare
      // ".5" is legal too), but the SSSSSS pattern demands exactly 6 —
      // so normalize: pad short fractions to 6 with zeros, truncate
      // nanos to micros (Spark timestamps are µs anyway, SURVEY §7.3-1).
      .withColumn("ts", expr(
        """try_to_timestamp(
          |  concat(
          |    regexp_extract(ts_raw,
          |      '^(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})', 1),
          |    '.',
          |    substring(rpad(coalesce(nullif(regexp_extract(ts_raw,
          |      '^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.(\\d{1,9})',
          |      1), ''), '0'), 6, '0'), 1, 6)),
          |  "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")""".stripMargin))
      .filter(col("ts").isNotNull)
      .withColumn("uuid",
        sha2(concat_ws("|", col("container_id"), col("ts_raw"),
          col("line")), 256))
      .drop("ts_raw")
}
