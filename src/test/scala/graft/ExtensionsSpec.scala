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

  test("cartesian guard rejects big-by-big unconditioned joins") {
    spark.conf.set("graft.cartesianGuard.maxBytes", "1000")
    try {
      // the AnalysisException from the check rule may surface wrapped
      // in a SparkException depending on where analysis is triggered
      val e = intercept[Exception] {
        operators.LlmOps.embedNeardupAll(spark, sf).collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("[graft] Unbounded cartesian"))),
        e.toString)
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("guard allows tiny crosses, hinted bounded probes, equi-joins") {
    // tiny dim cross: under the default 64 MB threshold
    assert(SparkEntry.queries("q_join_cross_small")(spark, sf).count() > 0)
    // bounded probe window with explicit broadcast hint: allowed even
    // under an aggressive threshold (stats can't see through the
    // filter, the hint is the user's smallness assertion)
    spark.conf.set("graft.cartesianGuard.maxBytes", "1000")
    try {
      assert(SparkEntry.queries("q_llm_embed_neardup")(spark, sf)
        .count() > 0)
      // ordinary equi-joins are untouched
      assert(SparkEntry.queries("q_join_broadcast")(spark, sf).count() > 0)
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("guard can be disabled with -1") {
    spark.conf.set("graft.cartesianGuard.maxBytes", "-1")
    try {
      assert(operators.LlmOps.embedNeardupAll(spark, sf).count() > 0)
    } finally spark.conf.unset("graft.cartesianGuard.maxBytes")
  }

  test("as-of strategy is injected: native as-of join plans and runs") {
    val df = SparkEntry.queries("q_join_asof_native")(spark, sf)
    assert(df.count() > 0)
    // physical nodes print without the Exec suffix
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
  }
}
