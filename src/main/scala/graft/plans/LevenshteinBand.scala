package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression,
  GreaterThan, GreaterThanOrEqual, Length, LessThan, LessThanOrEqual,
  Levenshtein, Literal, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join,
  LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: edit-distance predicates get a FREE length-band
  * prefilter. One insert/delete changes a string's length by at most 1,
  * so `levenshtein(a, b) ≤ k ⟹ |length(a) − length(b)| ≤ k` — the rule
  * conjoins the implied band onto any join condition or filter that
  * bounds a two-argument levenshtein. The band costs two O(1) length
  * reads per pair; the DP it short-circuits is O(|a|·|b|). On a fuzzy
  * self-join (the `q_llm_fuzzy_join` shape written naively, without the
  * hand-built band) the evaluator now rejects length-mismatched pairs
  * before ever running the quadratic DP.
  *
  * Soundness notes:
  *  - conjunction-only: every row the original condition accepts also
  *    satisfies the band (a TRUE levenshtein bound forces both sides
  *    non-null and within k edits), so results are unchanged for every
  *    join type — the band can only skip work, never rows.
  *  - the THREE-argument `levenshtein(a, b, t)` is deliberately NOT
  *    matched: it returns −1 when the distance exceeds t, so
  *    `levenshtein(a, b, t) ≤ k` is TRUE for arbitrarily distant pairs
  *    and implies no length band at all.
  *  - idempotent: a band already present (semantically) is not re-added,
  *    so fixpoint optimizer batches don't grow the condition.
  *  - conjunct-scoped: bands are harvested ONLY from TOP-LEVEL conjuncts
  *    of the condition. A levenshtein bound nested under OR / NOT /
  *    CASE WHEN does not hold unconditionally — e.g. in
  *    `lev(a,b) <= 2 OR a.id = b.id` a row may satisfy only the second
  *    disjunct with an arbitrary length gap — so conjoining its band at
  *    the top level would wrongly drop rows. Splitting on AND and
  *    matching each conjunct whole makes the implication exact.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] with PredicateHelper {

  private def bandsFor(cond: Expression): Seq[Expression] = {
    def band(l: Expression, r: Expression): Expression =
      Abs(Subtract(Length(l), Length(r)))
    // Only a conjunct that IS a bounded levenshtein (not one that merely
    // CONTAINS one under OR/NOT/CASE) implies the band unconditionally.
    val implied = splitConjunctivePredicates(cond).collect {
      case LessThanOrEqual(Levenshtein(l, r, None),
          k @ Literal(_, IntegerType)) =>
        LessThanOrEqual(band(l, r), k)
      case LessThan(Levenshtein(l, r, None),
          k @ Literal(_, IntegerType)) =>
        LessThan(band(l, r), k)
      case GreaterThanOrEqual(k @ Literal(_, IntegerType),
          Levenshtein(l, r, None)) =>
        LessThanOrEqual(band(l, r), k)
      case GreaterThan(k @ Literal(_, IntegerType),
          Levenshtein(l, r, None)) =>
        LessThan(band(l, r), k)
    }
    implied.filterNot(i => cond.exists(_.semanticEquals(i)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, _, Some(cond), _) =>
      val bands = bandsFor(cond)
      if (bands.isEmpty) j
      else j.copy(condition = Some(bands.foldLeft(cond)(And.apply)))
    case f @ Filter(cond, child) =>
      val bands = bandsFor(cond)
      if (bands.isEmpty) f
      else Filter(bands.foldLeft(cond)(And.apply), child)
  }
}
