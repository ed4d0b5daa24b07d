package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Properties of the round-7 J9 rows the DuckDB oracle can't express:
  * monotonicity across scoreboard arms, idempotency, and estimator
  * sanity bounds (SURVEY §5.2). */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = { spark.catalog.clearCache(); spark.stop() }

  test("mrl_recall: recall is monotone non-decreasing in kept dimensions") {
    // more dimensions can only refine the cosine toward the full-dim
    // truth on average; the enrolled 8→16→32 arms must not invert
    val rows = operators.Curation.mrlRecall(spark, sf)
      .orderBy("dim").collect()
    assert(rows.length == 3)
    val recalls = rows.map(_.getAs[Long]("recall_e4"))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall not monotone: ${recalls.toSeq}")
    // absolute recall is LOW on this fixture (random embeddings have no
    // Matryoshka structure — truncation loses rank information fast;
    // sf0.001 reads 666/1166/2500 e4) — that is the diagnostic the row
    // exposes; the invariant worth pinning is that more dims strictly
    // help between the extremes and the scale stays valid
    assert(recalls.last > recalls.head,
      s"32 dims should beat 8 dims: ${recalls.toSeq}")
    assert(recalls.forall(r => r >= 0 && r <= 10000), recalls.toSeq)
  }

  test("minhash_1bit: estimates bounded and 16-perm beats 1-bit on MAE") {
    val rows = operators.Curation.minhash1Bit(spark, sf).collect()
    assert(rows.nonEmpty, "no candidate pairs at sf0.001")
    rows.foreach { r =>
      val (e16, e1, j) = (r.getAs[Long]("est16_e4"),
        r.getAs[Long]("est1_e4"), r.getAs[Long]("jacc_e4"))
      assert(e16 >= 0 && e16 <= 10000, s"est16 out of range: $e16")
      assert(e1 >= 0 && e1 <= 10000, s"est1 out of range: $e1")
      assert(j >= 0 && j <= 10000, s"jacc out of range: $j")
    }
    val mae16 = rows.map(r => math.abs(r.getAs[Long]("est16_e4") -
      r.getAs[Long]("jacc_e4"))).sum.toDouble / rows.length
    val mae1 = rows.map(r => math.abs(r.getAs[Long]("est1_e4") -
      r.getAs[Long]("jacc_e4"))).sum.toDouble / rows.length
    // 16 full values carry strictly more information than 16 parity
    // bits; on LSH-collided (high-J) pairs the debiased 1-bit estimate
    // is noisier — allow equality for degenerate all-exact corpora
    assert(mae16 <= mae1 + 1e-9,
      s"16-perm MAE $mae16 should not exceed 1-bit MAE $mae1")
  }

  test("events_dedup_window: idempotent and never keeps two in-window twins") {
    val kept = operators.Curation.eventsDedupWindow(spark, sf)
    val n = kept.count()
    val total = Tables.events(spark, sf).count()
    assert(n > 0 && n <= total)
    val dupKeys = kept.groupBy("user_id", "event_type", "w_start")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(dupKeys == 0L, s"$dupKeys (user,type,window) keys kept twice")
  }

  test("gopher/c4 gates keep a sane fraction and flags imply keep") {
    for (df <- Seq(operators.Curation.gopherRules(spark, sf),
        operators.Curation.c4Rules(spark, sf))) {
      val flagCols = df.columns.filter(c => c.startsWith("r_"))
      val bad = df.filter(col("keep") &&
        !flagCols.map(col).reduce(_ && _)).count()
      assert(bad == 0L, "keep=true with a failing rule flag")
      assert(df.filter(col("keep")).count() > 0, "gate keeps nothing")
    }
  }

  test("plan shapes: pruned reads and pushed probe filters (no drift)") {
    def plan(name: String): String =
      SparkEntry.queries(name)(spark, sf).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // gopher reads ONLY (doc_id, text) — the rule lambdas must not
    // drag lang/source/n_chars into the scan
    val g = plan("q_llm_gopher_rules")
    assert(g.contains("ReadSchema: struct<doc_id:bigint,text:string>"), g
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
    // hamming probes push vec_id < 20 into the parquet scan
    val h = plan("q_llm_hamming_embed")
    assert(h.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,20)]"),
      h.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
    // dedup-window partitions by the full (user, type, window) key —
    // the state key a streaming twin would use
    val d = plan("q_events_dedup_window")
    assert(d.contains("user_id") && d.contains("w_start"),
      "window partition key missing from plan")
  }

  test("mrl_recall: a dim with ZERO hits still emits its row (n_hits=0, " +
      "recall 0) — engine parity with the oracle's VALUES LEFT JOIN " +
      "(round 9, carried ADVICE empty-aggregate case)") {
    import spark.implicits._
    // one probe (vec_id 0 < 20), six candidates (21..26, never probes).
    // Head/tail construction: p = e1 + e9. Candidates 21-23 = e2 + e9
    // (dim-8 slice orthogonal to p, full cosine 0.5); 24-26 = e1 + e10
    // (dim-8 slice IS p's, cosine 1; full cosine 0.5). All six tie at
    // 0.5 on full/16/32 dims → vec_id tiebreak → top3 = {21,22,23};
    // dim-8 ranks {24,25,26} first → zero overlap with the full top3.
    def vec(dims: Int*): Array[Float] = {
      val a = Array.fill(64)(0.0f); dims.foreach(d => a(d - 1) = 1.0f); a
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_mrl_zero")
      .toFile.getAbsolutePath
    (Seq((0L, vec(1, 9))) ++
      (21L to 23L).map(id => (id, vec(2, 9))) ++
      (24L to 26L).map(id => (id, vec(1, 10))))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = operators.Curation.mrlRecall(spark, dir)
      .collect().map(r => (r.getAs[Int]("dim"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_e4")))
    // the dim-8 row must EXIST with n_hits = 0 (a GROUP-BY-shaped agg
    // would omit it; the oracle's VALUES LEFT JOIN keeps it) and the
    // guarded division must emit 0, not NULL
    assert(rows.toSeq == Seq((8, 0L, 0L), (16, 3L, 10000L),
      (32, 3L, 10000L)), rows.mkString(","))
  }

  test("mrl_recall: a degenerate store (single vector, empty full-rank " +
      "frame) emits total=0 rows with recall 0, not NULL or an error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_mrl_one")
      .toFile.getAbsolutePath
    Seq((0L, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = operators.Curation.mrlRecall(spark, dir)
      .collect().map(r => (r.getAs[Int]("dim"),
        r.getAs[Long]("n_hits"), r.isNullAt(2), r.getAs[Long]("recall_e4")))
    assert(rows.toSeq == Seq((8, 0L, false, 0L), (16, 0L, false, 0L),
      (32, 0L, false, 0L)), rows.mkString(","))
  }

  test("kn_bigram: probabilities positive and below 1e6 (valid e6 scale)") {
    val rows = operators.Curation.knBigram(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val p = r.getAs[Long]("p_kn_e6")
      assert(p > 0 && p <= 1000000, s"p_kn_e6 out of (0, 1e6]: $p")
    }
  }
}
