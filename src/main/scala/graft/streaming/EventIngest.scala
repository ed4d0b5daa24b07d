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

  private def idempotentBatchWrite(storeDir: String)(batch: DataFrame,
      batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "date")
      .parquet(storeDir)

  /** Start the ingestion pipeline: JSON-lines dir → normalized events →
    * date-partitioned parquet store. */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
      checkpointDir: String): StreamingQuery =
    DockerEvents.readEventStream(spark, srcDir)
      .withColumn("date", col("ts").cast("date"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentBatchWrite(storeDir) _)
      .start()

  /** EP3 parity — the container log follower (muswarmlogger/loggers.py
    * save_container_logs): a text-file stream of raw
    * "RFC3339-nano SPACE message" lines → parsed, uuid-minted,
    * date-partitioned parquet. One follower per container in the
    * reference; here one streaming query per source dir, with
    * container_id stamped at parse time. Where the reference issued one
    * SPARQL INSERT per line (its throughput ceiling), each micro-batch
    * lands as one bulk columnar append. */
  def startLogFollower(spark: SparkSession, srcDir: String,
      containerId: String, storeDir: String,
      checkpointDir: String): StreamingQuery =
    DockerEvents.parseLogLines(
        spark.readStream.text(srcDir), containerId)
      .withColumn("date", col("ts").cast("date"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(idempotentBatchWrite(storeDir) _)
      .start()

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
