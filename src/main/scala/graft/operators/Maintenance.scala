package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY.md §2-J4 — incremental view maintenance: merge a new batch's
  * partial aggregate into a materialized base aggregate WITHOUT
  * rescanning the base data — the identity every 100 TB rollup pipeline
  * lives on (count and sum are commutative monoids; merging partials
  * equals recomputing, so a day's delta updates a year's rollup in one
  * tiny join).
  *
  * The enrolled row proves the identity end-to-end: it computes the
  * base aggregate (event_id%10 < 8 — the "materialized" 80%), the delta
  * aggregate (the new 20%), full-outer-merges them, AND recomputes the
  * aggregate from scratch, emitting an `agrees` verdict per group. Sums
  * run over integer-quantized values (floor(value·10⁴) as BIGINT), so
  * merge-vs-recompute equality is exact — never a float-summation-order
  * artifact.
  *
  * Scale shape: base and delta aggregates are partial-aggregable
  * single-shuffle groupBys; the merge is a full-outer join on the
  * (low-cardinality) group key; in production the base side is the
  * stored rollup table and only the delta side is computed per batch.
  */
object Maintenance {

  def incrAggMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("event_type"),
        expr("CAST(floor(value * 10000.0) AS BIGINT)").as("vq"))
    def agg(df: DataFrame, nc: String, sc: String) =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as(nc), sum(col("vq")).as(sc))
    val base = agg(ev.filter(pmod(col("event_id"), lit(10)) < 8), "n0", "s0")
    val delta = agg(ev.filter(pmod(col("event_id"), lit(10)) >= 8), "n1", "s1")
    val full = agg(ev, "n_full", "s_full")
    base.join(delta, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_merged"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
          .as("s_merged"))
      .join(full, Seq("event_type"))
      .select(col("event_type"), col("n_merged"), col("s_merged"),
        (col("n_merged") === col("n_full") &&
          col("s_merged") === col("s_full")).as("agrees"))
      .orderBy(col("event_type"))
  }

  /** Pipeline observability (round 5): piggyback data-quality counters
    * onto the SAME job via `Dataset.observe` — row counts, null rates,
    * value bounds ride the pipeline's one pass as accumulator-backed
    * aggregates, so a 100 TB job self-audits without a second scan (a
    * separate audit query would re-read the input). The returned
    * [[org.apache.spark.sql.Observation]] yields the metric row after
    * the first action on the returned frame; works identically under
    * streaming via `StreamingQueryListener` observed metrics. */
  def withAudit(df: DataFrame, name: String,
      metrics: org.apache.spark.sql.Column*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "at least one audit metric")
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ivm_agg_merge" -> incrAggMerge,
  )

  val oracle: Map[String, String] = Map(
    "q_ivm_agg_merge" ->
      """WITH ev AS (SELECT event_id, event_type,
        |   CAST(floor(value * 10000.0) AS BIGINT) AS vq FROM events),
        |base AS (SELECT event_type, count(*) AS n0,
        |   CAST(sum(vq) AS BIGINT) AS s0
        |  FROM ev WHERE event_id % 10 < 8 GROUP BY 1),
        |delta AS (SELECT event_type, count(*) AS n1,
        |   CAST(sum(vq) AS BIGINT) AS s1
        |  FROM ev WHERE event_id % 10 >= 8 GROUP BY 1),
        |fullagg AS (SELECT event_type, count(*) AS n_full,
        |   CAST(sum(vq) AS BIGINT) AS s_full FROM ev GROUP BY 1),
        |merged AS (SELECT coalesce(b.event_type, d.event_type) AS event_type,
        |   coalesce(b.n0, 0) + coalesce(d.n1, 0) AS n_merged,
        |   coalesce(b.s0, 0) + coalesce(d.s1, 0) AS s_merged
        |  FROM base b FULL OUTER JOIN delta d ON b.event_type = d.event_type)
        |SELECT m.event_type, m.n_merged, m.s_merged,
        | m.n_merged = f.n_full AND m.s_merged = f.s_full AS agrees
        |FROM merged m JOIN fullagg f ON m.event_type = f.event_type
        |ORDER BY m.event_type""".stripMargin,
  )
}
