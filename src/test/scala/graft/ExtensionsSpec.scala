package graft

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The `spark.sql.extensions=graft.plans.GraftExtensions` entry point:
  * as-of strategy injection and the cartesian-product guard. */
class ExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    // force a fresh session so the extensions conf is honored even when
    // another suite's session was created first in this JVM
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  // Guard tests invoke the rule DIRECTLY on analyzed plans: suites run
  // in parallel in one JVM, so getOrCreate can hand this suite a
  // sibling's session without the extensions installed — session-level
  // wiring is asserted separately below.
  private def guard(plan: org.apache.spark.sql.DataFrame): Unit =
    plans.CartesianGuard(spark)(plan.queryExecution.analyzed)

  test("cartesian guard rejects big-by-big unconditioned joins") {
    spark.conf.set("graft.cartesianGuard.maxBytes", "1000")
    try {
      val e = intercept[AnalysisException] {
        guard(operators.LlmOps.embedNeardupAll(spark, sf))
      }
      assert(e.getMessage.contains("[graft] Unbounded cartesian"),
        e.getMessage)
      // pure theta join (no equality): also cartesian-shaped
      val emb = graft.Tables.embeddings(spark, sf)
      val e2 = intercept[AnalysisException] {
        guard(emb.as("x").join(emb.as("y"),
          org.apache.spark.sql.functions.col("x.vec_id")
            < org.apache.spark.sql.functions.col("y.vec_id")))
      }
      assert(e2.getMessage.contains("[graft] Unbounded cartesian"))
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("guard allows tiny crosses, hinted bounded probes, equi-joins") {
    // Build every test plan under the DEFAULT threshold first: the
    // session's own injected check rule runs at Dataset construction,
    // so plans meant to trip the tightened threshold must exist before
    // the conf changes — then the rule is exercised directly.
    val tinyCross = SparkEntry.queries("q_join_cross_small")(spark, sf)
    val hintedProbe = SparkEntry.queries("q_llm_embed_neardup")(spark, sf)
    val equiJoin = SparkEntry.queries("q_join_broadcast")(spark, sf)
    import org.apache.spark.sql.functions.broadcast
    val emb = graft.Tables.embeddings(spark, sf)
    val dim = graft.Tables.region(spark, sf)
    val inner = broadcast(dim).join(dim.withColumnRenamed("r_name", "n2"),
      "r_regionkey")
    // a broadcast hint buried in a NESTED join must NOT waive the
    // guard for an outer unhinted cartesian
    val outer = emb.crossJoin(inner.limit(1)).crossJoin(
      emb.select(org.apache.spark.sql.functions.col("vec_id").as("v2")))
    guard(tinyCross) // tiny dim cross passes the default threshold
    spark.conf.set("graft.cartesianGuard.maxBytes", "1000")
    try {
      // hint = the user's smallness assertion (stats can't see through
      // the probe filter) — allowed even under an aggressive threshold
      guard(hintedProbe)
      guard(equiJoin) // ordinary equi-joins are untouched
      intercept[AnalysisException] { guard(outer) }
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("guard can be disabled with -1") {
    spark.conf.set("graft.cartesianGuard.maxBytes", "-1")
    try {
      guard(operators.LlmOps.embedNeardupAll(spark, sf))
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("levenshtein band rule: bounded 2-arg predicates gain the " +
      "implied length band; thresholded 3-arg form is untouched; " +
      "results unchanged and idempotent") {
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    import spark.implicits._
    // distances from "aaaa": aaab=1, zzzz=4, aaaaaa=2, aab=2
    val names = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "zzzz"),
      (4L, "aaaaaa"), (5L, "aab")).toDF("id", "name")
    // direct rule application (same pattern as the guard tests — suites
    // share a JVM, so session-level wiring is asserted separately)
    val naive = broadcast(names.as("a")).join(names.as("b"),
      expr("levenshtein(a.name, b.name) <= 2") &&
        col("a.id") < col("b.id"))
    val once = plans.LevenshteinBandRule(naive.queryExecution.analyzed)
    assert(once.toString.contains("abs((length"), once.toString)
    // idempotent: a second application adds nothing
    assert(plans.LevenshteinBandRule(once).toString == once.toString)
    // conjunction-only: banded results == naive results
    val banded = Seq((1L, 2L), (1L, 4L), (1L, 5L), (2L, 5L))
    assert(naive.select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == banded.toSet)
    // the session has the extensions installed — the optimized plan of
    // a session-built query carries the band without manual application
    val viaSession = broadcast(names.as("a")).join(names.as("b"),
      expr("levenshtein(a.name, b.name) <= 2"))
    assert(viaSession.queryExecution.optimizedPlan.toString
      .contains("abs((length"),
      viaSession.queryExecution.optimizedPlan.toString)
    // 3-arg thresholded levenshtein returns -1 past the threshold —
    // NO band may be inferred from it
    val thresholded = broadcast(names.as("a")).join(names.as("b"),
      expr("levenshtein(a.name, b.name, 1) <= 2"))
    assert(!plans.LevenshteinBandRule(
      thresholded.queryExecution.analyzed).toString.contains("abs((length"))
  }

  test("levenshtein band rule: bounds under OR / NOT imply no band — " +
      "rows satisfied by the other branch survive") {
    import org.apache.spark.sql.functions.{broadcast, col, expr}
    import spark.implicits._
    val names = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "zzzzzzzzzz"),
      (4L, "aaaaaa"), (5L, "aab")).toDF("id", "name")
    // pair (1,3) = ("aaaa","zzzzzzzzzz") matches ONLY via the second
    // disjunct, with length gap 6 — a wrongly top-level-conjoined band
    // |len(a)-len(b)| <= 2 would drop it.
    val disj = broadcast(names.as("a")).join(names.as("b"),
      expr("levenshtein(a.name, b.name) <= 2 " +
        "OR (a.id = 1 AND b.id = 3)"))
    // the rule must add no band under a disjunction...
    val disjOnce = plans.LevenshteinBandRule(
      disj.queryExecution.analyzed)
    assert(!disjOnce.toString.contains("abs((length"), disjOnce.toString)
    // ...and the session-optimized result must contain the (1,3) pair
    // that only the second disjunct admits (length gap 6 > 2)
    assert(disj.select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet.contains((1L, 3L)))
    // NOT(levenshtein <= k) is an anti-bound — no band either
    val negated = broadcast(names.as("a")).join(names.as("b"),
      expr("NOT (levenshtein(a.name, b.name) <= 2)"))
    assert(!plans.LevenshteinBandRule(negated.queryExecution.analyzed)
      .toString.contains("abs((length"))
    // CASE WHEN wrapping the bound: conditional, not implied — no band
    val cased = broadcast(names.as("a")).join(names.as("b"),
      expr("CASE WHEN a.id = b.id THEN true " +
        "ELSE levenshtein(a.name, b.name) <= 2 END"))
    assert(!plans.LevenshteinBandRule(cased.queryExecution.analyzed)
      .toString.contains("abs((length"))
    // a bound that is ONE CONJUNCT of an AND still gets its band
    val conj = broadcast(names.as("a")).join(names.as("b"),
      expr("levenshtein(a.name, b.name) <= 2 AND a.id < b.id"))
    assert(plans.LevenshteinBandRule(conj.queryExecution.analyzed)
      .toString.contains("abs((length"))
  }

  test("as-of strategy is injected: native as-of join plans and runs") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, sf)
    assert(df.count() > 0)
    // physical nodes print without the Exec suffix
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }

  test("graft scalar functions are injected session-wide: a pure-SQL " +
      "session uses fvec_dot/nfc_normalize from the conf line alone") {
    // no register() call anywhere on this path — the extensions conf
    // is the only wiring, exactly the cluster deployment shape
    val r = spark.sql(
      "SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))," +
        " array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d," +
        " nfc_normalize('Cafe\u0301') AS n," +
        " simhash60(array(7L)) AS s").collect().head
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-6, r.toString)
    assert(r.getString(1) == "Caf\u00e9", r.getString(1))
    assert(r.getLong(2) == 7L, r.toString) // one hash: sign bits = its bits
    // and the full pure-SQL surface runs end to end through the views
    GraftCatalog.init(spark, sf)
    val topk = spark.sql("SELECT count(*) AS n FROM (" +
      "SELECT vec_id, fvec_norm(embedding) AS nrm FROM embeddings)" +
      " WHERE nrm > 0").collect().head.getLong(0)
    assert(topk > 0)
  }
}
