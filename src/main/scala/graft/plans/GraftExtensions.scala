package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** The engine's `spark.sql.extensions` entry point — how a cluster
  * deployment turns a stock SparkSession into a graft session:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  *
  * Injects:
  *  - [[AsOfStrategy]] — the native as-of join physical strategy (its
  *    per-session `experimental.extraStrategies` registration in
  *    [[AsOfJoinDF.asofJoin]] remains for ad-hoc sessions);
  *  - [[CartesianGuard]] — a post-analysis check that REJECTS unbounded
  *    cartesian products before they execute;
  *  - [[LevenshteinBandRule]] — an optimizer rule conjoining the implied
  *    `|len(a)−len(b)| ≤ k` band onto bounded-levenshtein predicates
  *    (round 5).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def fn(name: String, clazz: Class[_])(
      b: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), b)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfStrategy)
    ext.injectCheckRule(spark => CartesianGuard(spark))
    ext.injectOptimizerRule(_ => LevenshteinBandRule)
    // graft scalar functions session-wide (round 8): the codegen
    // expressions behind the pure-SQL surface ([[graft.GraftCatalog]])
    // come up with ZERO application code on an extensions-configured
    // cluster — a spark.sql-only user gets fvec_dot and friends from
    // the conf line alone. (The aggregate/sketch builders —
    // graft_bloom_agg, freq_sketch — keep their per-session register()
    // path via GraftCatalog.registerFunctions, which validates their
    // literal-argument contracts.)
    ext.injectFunction(fn("fvec_dot",
      classOf[graft.functions.FloatVectorDot])(
      es => graft.functions.FloatVectorDot(es(0), es(1))))
    ext.injectFunction(fn("fvec_norm",
      classOf[graft.functions.FloatVectorNorm])(
      es => graft.functions.FloatVectorNorm(es.head)))
    ext.injectFunction(fn("simhash60",
      classOf[graft.functions.SimHash60])(
      es => graft.functions.SimHash60(es.head)))
    ext.injectFunction(fn("nfc_normalize",
      classOf[graft.functions.NfcNormalize])(
      es => graft.functions.NfcNormalize(es.head)))
  }
}

/** Guardrail for 100 TB clusters: an unconditioned inner/cross join
  * whose smaller side exceeds a size threshold is almost always a query
  * bug (the output is |L|×|R| rows), and on a large cluster it runs for
  * hours before anyone notices. This check rule fails the query at
  * analysis time instead.
  *
  * Threshold: `graft.cartesianGuard.maxBytes` (default 64 MB) — a
  * cartesian is allowed when EITHER side's stats-estimated size is
  * under it (tiny-dim crosses like `q_join_cross_small` pass; the
  * test-only all-pairs baselines trip it), or when either side carries
  * an explicit `broadcast()` hint — size-only stats don't shrink
  * through filters, so a hinted bounded probe set (the
  * `q_llm_embed_neardup` shape) is the user asserting "this side is
  * small"; the hint makes that assertion visible to the guard. Set to
  * -1 to disable.
  */
case class CartesianGuard(spark: org.apache.spark.sql.SparkSession)
    extends (LogicalPlan => Unit) {

  private def maxBytes: Long =
    spark.conf.getOption("graft.cartesianGuard.maxBytes")
      .map(_.toLong).getOrElse(64L * 1024 * 1024)

  // A hint counts only when it governs one of THIS join's sides: walk
  // down through unary nodes but stop at nested joins — a broadcast()
  // deep inside an unrelated inner join must not waive the outer guard.
  private def sideHasBroadcastHint(p: LogicalPlan): Boolean = p match {
    case ResolvedHint(_, hints) => hints.strategy.contains(BROADCAST)
    case _: Join => false
    case other => other.children.exists(sideHasBroadcastHint)
  }

  override def apply(plan: LogicalPlan): Unit = {
    val limit = maxBytes
    if (limit < 0) return
    plan.foreach {
      // a join is cartesian-shaped when it has NO condition, or a
      // condition with no equality at all (pure theta joins plan as
      // nested-loop over the full pair space, same blow-up)
      case j @ Join(left, right, Inner | Cross, cond, _)
          if cond.forall(c => !c.exists(e =>
            e.isInstanceOf[EqualTo] || e.isInstanceOf[EqualNullSafe])) &&
            !sideHasBroadcastHint(left) && !sideHasBroadcastHint(right) =>
        val lSize = left.stats.sizeInBytes
        val rSize = right.stats.sizeInBytes
        if (lSize > limit && rSize > limit) {
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              (s"[graft] Unbounded cartesian product: both join sides " +
                s"exceed graft.cartesianGuard.maxBytes=$limit " +
                s"(left=$lSize, right=$rSize bytes). Bound one side, " +
                s"broadcast a bounded probe set, or use an equi-join " +
                s"prefilter (LSH bucket / band join). Set " +
                s"graft.cartesianGuard.maxBytes=-1 to override.")))
        }
      case _ =>
    }
  }
}
