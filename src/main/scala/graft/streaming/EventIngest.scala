package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference's write path as a Structured Streaming pipeline
  * (SURVEY §3.1 EP1–EP3 → §3.2):
  *
  *   Docker `GET /events` JSON stream          → file/Kafka readStream
  *   per-event SPARQL `INSERT DATA` (loggers.py ≈L50, one HTTP
  *   round-trip per record — the reference's perf cliff)
  *                                             → foreachBatch bulk
  *                                               append, partitioned by
  *                                               event date
  *
  * Scale notes: the sink partitions by (batch_id, date) so downstream
  * reads prune on date; each micro-batch is one bulk columnar write
  * instead of the reference's per-record round-trip. Effectively-once:
  * the checkpoint (WAL + offsets — the analog of the reference's
  * `since=` resume bookkeeping, loggers.py ≈L35) guarantees each batch
  * id is re-executed at most from its last uncommitted point, and the
  * batch_id-partitioned DYNAMIC-overwrite write makes that re-execution
  * idempotent: a crash between the parquet write and the checkpoint
  * commit rewrites exactly the same batch_id partitions instead of
  * appending duplicates.
  */
object EventIngest {

  /** A per-micro-batch transform, the analog of the reference's
    * `register_event`-decorated handlers (muswarmlogger/events.py ≈L90
    * [C-med]): users extend the pipeline without touching the pump. */
  type Handler = DataFrame => DataFrame

  // Insertion-ordered registry so handler composition is deterministic;
  // the decorator registry in the reference is likewise append-ordered.
  private val handlerReg =
    scala.collection.mutable.LinkedHashMap[String, Handler]()

  /** Register a named micro-batch handler applied (in registration
    * order) to every batch of pipelines started AFTER registration —
    * the registry is snapshotted at `start()` time, so a running
    * pipeline's behavior never changes mid-stream and a replayed batch
    * id always sees the same handler chain (idempotent replays).
    * Re-registering a name replaces the handler for future starts. */
  def registerHandler(name: String)(h: Handler): Unit =
    synchronized { handlerReg(name) = h }

  def clearHandlers(): Unit = synchronized { handlerReg.clear() }

  private def idempotentBatchWrite(storeDir: String,
      handlers: Seq[Handler])(batch: DataFrame, batchId: Long): Unit =
    handlers.foldLeft(batch)((df, h) => h(df))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "date")
      .parquet(storeDir)

  /** Start the ingestion pipeline: JSON-lines dir → normalized events →
    * date-partitioned parquet store. `handlers` compose after the
    * globally registered ones; the chain is fixed at start time. */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
      checkpointDir: String,
      handlers: Seq[Handler] = Nil): StreamingQuery = {
    val chain = synchronized { handlerReg.values.toSeq } ++ handlers
    DockerEvents.readEventStream(spark, srcDir)
      .withColumn("date", col("ts").cast("date"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentBatchWrite(storeDir, chain) _)
      .start()
  }

  /** EP3 parity — the container log follower (muswarmlogger/loggers.py
    * save_container_logs): a text-file stream of raw
    * "RFC3339-nano SPACE message" lines → parsed, uuid-minted,
    * date-partitioned parquet. One follower per container in the
    * reference; here one streaming query per source dir, with
    * container_id stamped at parse time. Where the reference issued one
    * SPARQL INSERT per line (its throughput ceiling), each micro-batch
    * lands as one bulk columnar append. */
  // Follower writes lead with container_id in the partition spec: many
  // followers share one store, and their independent batch_id counters
  // would otherwise collide in the same batch_id=N/date=D directories
  // (dynamic overwrite would silently clobber a sibling follower's
  // batch). A container_id prefix gives each follower its own partition
  // subtree, keeping the per-follower idempotent-rewrite contract.
  private def idempotentFollowerWrite(storeDir: String)(batch: DataFrame,
      batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("container_id", "batch_id", "date")
      .parquet(storeDir)

  def startLogFollower(spark: SparkSession, srcDir: String,
      containerId: String, storeDir: String,
      checkpointDir: String): StreamingQuery =
    DockerEvents.parseLogLines(
        spark.readStream.text(srcDir), containerId)
      .withColumn("date", col("ts").cast("date"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentFollowerWrite(storeDir) _)
      .start()

  /** EP1 parity — startup attach (muswarmlogger/loggers.py `@on_startup`
    * ≈L15 [C-med]): the reference enumerates the containers that are
    * ALREADY running when the service boots and attaches a log follower
    * to each; followers started later via events cover only new
    * containers. Analog: enumerate the pre-existing per-container log
    * dirs under `containersRoot` (one subdir per container, the harness's
    * stand-in for `docker ps`) and start one follower per dir. Log files
    * written BEFORE attach still land in the store because a file-stream
    * source with a fresh checkpoint processes all existing files in its
    * first micro-batch. The directory listing is control-plane work on
    * the driver (the analog of the reference's one `containers()` API
    * call), not a data-plane collect. */
  def attachExistingFollowers(spark: SparkSession, containersRoot: String,
      storeDir: String, checkpointRoot: String)
      : Seq[(String, StreamingQuery)] = {
    val dirs = Option(new java.io.File(containersRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.isDirectory).sortBy(_.getName).toSeq
    dirs.map { d =>
      val cid = d.getName
      cid -> startLogFollower(spark, d.getAbsolutePath, cid, storeDir,
        s"$checkpointRoot/$cid")
    }
  }

  /** Catch-up run (round 4): `Trigger.AvailableNow` processes every
    * file currently in the source — across as many rate-limited
    * micro-batches as `maxFilesPerTrigger` implies, checkpointing each
    * one — and then TERMINATES. This is the scheduled-batch operating
    * mode of a 100 TB ingestion pipeline (run hourly from cron /
    * an orchestrator, pay executors only while catching up) with
    * exactly the same code, checkpoint, and idempotence contract as
    * the always-on stream: a later run resumes from the checkpoint and
    * ingests only files that arrived since. Unlike the deprecated
    * `Trigger.Once`, AvailableNow respects the per-batch rate limit,
    * so a large backlog cannot OOM a single giant micro-batch. */
  def runCatchUp(spark: SparkSession, srcDir: String, containerId: String,
      storeDir: String, checkpointDir: String): StreamingQuery =
    DockerEvents.parseLogLines(
        spark.readStream.option("maxFilesPerTrigger", 1).text(srcDir),
        containerId)
      .withColumn("date", col("ts").cast("date"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch(idempotentFollowerWrite(storeDir) _)
      .start()

  /** Keyed upsert sink — the reference's state-update shape: when a
    * container changes state it REPLACES that container's triples in
    * the store (delete+insert per subject), keeping one current row per
    * container rather than an event log.
    *
    * Per micro-batch: reduce the batch to its latest row per container
    * (max (ts, action) wins — deterministic tie-break), merge with the
    * previous snapshot, keep the latest per key, and write a NEW
    * versioned snapshot dir `v=<batchId>`. Writing a fresh dir instead
    * of overwriting in place avoids the read-your-own-overwrite hazard
    * and makes crash-retry idempotent (same batchId → same dir
    * rewritten). Old snapshots beyond the previous one are pruned
    * driver-side (control-plane file ops on a dir that holds one row
    * per container — never data-plane scale). */
  def startStateUpsert(spark: SparkSession, srcDir: String,
      storeRoot: String, checkpointDir: String): StreamingQuery =
    DockerEvents.readEventStream(spark, srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sess = batch.sparkSession
        val cols = batch.columns.map(col)
        val latestOf = (df: DataFrame) => df
          .groupBy(col("container_id"))
          .agg(max_by(struct(cols: _*), struct(col("ts"), col("action")))
            .as("r"))
          .select(col("r.*"))
        // Merge from the newest snapshot STRICTLY OLDER than this batch
        // id: on crash-retry of batch N, v=N may exist half-written —
        // reading it would both feed a partial snapshot into the merge
        // AND make the write below an overwrite-of-input (which Spark
        // rejects, wedging the stream). v<N is always a complete,
        // committed predecessor, so the replay is a pure rewrite.
        val merged = snapshotVersions(storeRoot).filter(_ < batchId)
          .maxOption
          .map(v => sess.read.parquet(s"$storeRoot/v=$v")) match {
          case Some(prev) => latestOf(latestOf(batch).unionByName(prev))
          case None => latestOf(batch)
        }
        merged.write.mode("overwrite").parquet(s"$storeRoot/v=$batchId")
        // prune snapshots older than the previous one (recursive,
        // null-safe: a crashed write can leave _temporary subtrees)
        snapshotVersions(storeRoot).sorted.dropRight(2).foreach { v =>
          deleteRecursively(new java.io.File(storeRoot, s"v=$v"))
        }
      }
      .start()

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRecursively)
    f.delete() // best-effort; a leftover dir is retried next batch
  }

  private def snapshotVersions(storeRoot: String): Seq[Long] =
    Option(new java.io.File(storeRoot).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(_.getName.stripPrefix("v=").toLong).toSeq

  /** Latest state snapshot (one row per container), if any. */
  def currentState(spark: SparkSession,
      storeRoot: String): Option[DataFrame] =
    snapshotVersions(storeRoot).maxOption
      .map(v => spark.read.parquet(s"$storeRoot/v=$v"))

  /** Triples-export view of the ingested store (the RDF write shape the
    * reference produced, as a batch view over the parquet store). */
  def storeTriples(spark: SparkSession, storeDir: String): DataFrame = {
    val ev = spark.read.parquet(storeDir)
    val s = concat(lit("http://swarmui.semte.ch/resources/containers/"),
      col("container_id"))
    ev.select(s.as("s"), explode(array(
        struct(lit("http://purl.org/dc/terms/type").as("p"),
          col("action").as("o")),
        struct(lit("http://mu.semte.ch/vocabularies/core/service").as("p"),
          coalesce(col("service"), lit("")).as("o"))
      )).as("po"))
      .select(col("s"), col("po.p").as("p"), col("po.o").as("o"))
  }
}
