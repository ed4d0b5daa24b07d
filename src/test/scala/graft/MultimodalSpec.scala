package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal._

/** Multimodal binary-column plumbing: decode/feature/resize/frame ops
  * over the synthetic GRFT format (decode itself is a documented stub —
  * the schema, batching, and corrupt-input contracts are real). */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def fixtures = {
    import spark.implicits._
    Seq(
      Media(1L, "image", encode(64, 48, Array.tabulate(256)(_.toByte))),
      Media(2L, "video", encode(16, 16, Array.tabulate(64)(_.toByte))),
      Media(3L, "image", "garbage-not-grft".getBytes),
      Media(4L, "audio", null)).toDS()
  }

  test("decode parses headers; corrupt/null blobs yield valid=false") {
    val d = Multimodal.decode(fixtures).collect()
      .map(x => x.media_id -> x).toMap
    assert(d(1L).width == 64 && d(1L).height == 48 && d(1L).n_bytes == 256)
    assert(d(1L).valid && d(2L).valid)
    assert(!d(3L).valid && !d(4L).valid)
  }

  test("feature extraction: L1-normalized 16-bin histogram") {
    val f = Multimodal.extractFeatures(fixtures).collect()
      .map(x => x.media_id -> x.features).toMap
    assert(f(1L).length == 16)
    assert(math.abs(f(1L).sum - 1.0f) < 1e-4)
    // uniform payload 0..255 → uniform histogram
    assert(f(1L).forall(v => math.abs(v - 1f / 16) < 1e-4))
    assert(f(3L).forall(_ == 0f)) // corrupt → zero vector, no throw
  }

  test("resize subsamples payload and rewrites the header") {
    val r = Multimodal.decode(Multimodal.resize(fixtures, 2)).collect()
      .map(x => x.media_id -> x).toMap
    assert(r(1L).width == 32 && r(1L).height == 24 && r(1L).n_bytes == 128)
    assert(r(3L).width == -1) // corrupt stays corrupt, untouched
  }

  test("frame sampling emits every k-th fixed-size frame") {
    val frames = Multimodal.sampleFrames(fixtures, frameBytes = 16,
      every = 2).collect().filter(_.media_id == 2L)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames.forall(_.frame.length == 16))
  }

  test("metadata-only projection does not read blob column in the scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_media_")
    fixtures.write.mode("overwrite").parquet(tmp.toString)
    val df = spark.read.parquet(tmp.toString)
      .select("media_id", "kind") // no blob
    val readSchema = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("blob"), readSchema)
  }
}
