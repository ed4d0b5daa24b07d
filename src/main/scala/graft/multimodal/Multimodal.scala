package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction / resize / frame-sampling as batch-shaped distributed
  * transforms.
  *
  * The container has no real image/audio codecs, so decode is STUBBED
  * against a deterministic synthetic format ("GRFT": 4-byte magic,
  * 4-byte big-endian width, 4-byte height, payload). Everything around
  * the stub — schema, binary handling, mapPartitions batch shape,
  * partition-local buffer reuse, null/corrupt-blob handling — is the
  * real Spark plumbing a production codec would drop into.
  *
  * Scale notes: transforms are `mapPartitions` (one JVM-side loop per
  * partition, no per-row closure dispatch), metadata-only operations
  * never touch the blob bytes (column pruning keeps blobs unread), and
  * blobs stay distributed — nothing is collected to the driver.
  */
object Multimodal {

  val MAGIC: Array[Byte] = "GRFT".getBytes("US-ASCII")

  case class Media(media_id: Long, kind: String, blob: Array[Byte])
  case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Int, valid: Boolean)
  case class Features(media_id: Long, features: Array[Float])
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  /** Encode a synthetic blob (test fixture generator — deterministic). */
  def encode(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + payload.length)
    buf.put(MAGIC).putInt(width).putInt(height).put(payload)
    buf.array()
  }

  /** Decode header metadata. STUB: a real codec (JPEG/FLAC/MP4 probe)
    * slots in here; the corrupt-input contract (valid=false, never
    * throw) is the part that matters at scale. */
  private def decodeOne(id: Long, kind: String, blob: Array[Byte]): Decoded =
    if (blob == null || blob.length < 12 ||
        !blob.take(4).sameElements(MAGIC))
      Decoded(id, kind, -1, -1, if (blob == null) 0 else blob.length,
        valid = false)
    else {
      val buf = java.nio.ByteBuffer.wrap(blob)
      buf.position(4)
      Decoded(id, kind, buf.getInt(), buf.getInt(), blob.length - 12,
        valid = true)
    }

  /** Batch decode: mapPartitions so a real codec could amortize init
    * (model load, native handles) once per partition. */
  def decode(media: Dataset[Media]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (codec/native handle allocation)
      it.map(m => decodeOne(m.media_id, m.kind, m.blob))
    }
  }

  /** Feature extraction: 16-bin byte histogram over the payload,
    * L1-normalized. STUB for an embedding model; the Array[Float] output
    * shape matches the `embeddings` table so downstream ANN ops
    * (graft.operators.LlmOps) consume it unchanged. */
  def extractFeatures(media: Dataset[Media]): Dataset[Features] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Float](16) // reused buffer, batch-shaped
      it.map { m =>
        java.util.Arrays.fill(hist, 0f)
        val d = decodeOne(m.media_id, m.kind, m.blob)
        if (d.valid) {
          var i = 12
          while (i < m.blob.length) {
            hist((m.blob(i) & 0xff) >> 4) += 1f
            i += 1
          }
          val total = math.max(1f, (m.blob.length - 12).toFloat)
          Features(m.media_id, hist.map(_ / total))
        } else Features(m.media_id, new Array[Float](16))
      }
    }
  }

  /** Resize: subsample payload by an integer factor, rewrite header.
    * STUB for a real scaler; preserves the format invariants. */
  def resize(media: Dataset[Media], factor: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val d = decodeOne(m.media_id, m.kind, m.blob)
      if (!d.valid) m
      else {
        val payload = m.blob.drop(12)
        val sampled = payload.indices.collect {
          case i if i % factor == 0 => payload(i)
        }.toArray
        Media(m.media_id, m.kind,
          encode(math.max(1, d.width / factor),
            math.max(1, d.height / factor), sampled))
      }
    })
  }

  /** Frame sampling for "video" blobs: fixed-size frames of
    * `frameBytes`, keep every `every`-th — a Generator-shaped op
    * (one input row → many frame rows). */
  def sampleFrames(media: Dataset[Media], frameBytes: Int,
      every: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val d = decodeOne(m.media_id, m.kind, m.blob)
      if (!d.valid) Iterator.empty
      else m.blob.drop(12).grouped(frameBytes).zipWithIndex
        .collect { case (f, i) if i % every == 0 => Frame(m.media_id, i, f) }
    }
  }

  /** Metadata-only projection over a media DataFrame — demonstrates that
    * blob-carrying tables support pruned scans (ReadSchema excludes the
    * binary column entirely). */
  def metaOnly(df: DataFrame): DataFrame =
    df.select(col("media_id"), col("kind"), length(col("blob")).as("n_bytes"))

  /** Enrolled scoreboard query: the full multimodal pipeline — encode a
    * deterministic GRFT blob per document (payload = the ASCII text
    * bytes), decode it back, extract the 16-bin byte histogram — with the
    * histogram emitted as INTEGER counts (features × payload length,
    * exactly recoverable from the L1-normalized floats) so the DuckDB
    * twin can recompute it from character codes and hash-match. This
    * exercises encode → binary column → mapPartitions decode →
    * feature-extract → join, not just the metadata path. */
  def mmFeatures(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val media = graft.Tables.documents(spark, dir)
      // byte == codepoint only holds for ASCII; enforce it by
      // construction on BOTH engines (same predicate in the oracle) so
      // a future non-ASCII fixture can't silently diverge the
      // byte-histogram from the char-code histogram
      .filter(col("text").rlike("^[\\x00-\\x7F]*$"))
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        Media(id, "image", encode(text.length, 1, text.getBytes("US-ASCII")))
      }
    val dec = decode(media).toDF()
    val feats = extractFeatures(media).toDF()
    dec.join(feats, "media_id")
      .select(col("media_id"), col("width"), col("height"), col("n_bytes"),
        col("valid"),
        expr("array_join(transform(features," +
          " f -> cast(round(f * greatest(n_bytes, 1)) as int)), ',')")
          .as("hist"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String)
      => DataFrame] = Map("q_mm_features" -> mmFeatures)

  val oracle: Map[String, String] = Map(
    "q_mm_features" ->
      """WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |hist AS (SELECT doc_id, ascii(ch) // 16 AS bin, count(*) AS cnt
        |  FROM chars GROUP BY 1, 2),
        |bins AS (SELECT d.doc_id, b.bin, coalesce(h.cnt, 0) AS cnt
        |  FROM documents d
        |  CROSS JOIN (SELECT unnest(range(16)) AS bin) b
        |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.bin = b.bin),
        |agg AS (SELECT doc_id, string_agg(cnt, ',' ORDER BY bin) AS hist
        |  FROM bins GROUP BY doc_id)
        |SELECT d.doc_id AS media_id,
        | CAST(length(d.text) AS INTEGER) AS width,
        | CAST(1 AS INTEGER) AS height,
        | CAST(length(d.text) AS INTEGER) AS n_bytes,
        | true AS valid, a.hist
        |FROM documents d JOIN agg a USING (doc_id)
        |WHERE regexp_matches(d.text, '^[\x00-\x7F]*$')
        |ORDER BY media_id""".stripMargin)
}
