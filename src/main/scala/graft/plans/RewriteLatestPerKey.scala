package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "latest row per key" window idiom
  *
  * {{{ ... WHERE row_number() OVER (PARTITION BY k ORDER BY v DESC) = 1 }}}
  *
  * into a `max_by`/`min_by` aggregate over the whole row.
  *
  * Why: the window formulation shuffles and SORTS every input row per
  * partition key before discarding all but one row per key; the
  * aggregate formulation carries a partial aggregate, so every map task
  * reduces its share to ≤|keys| rows BEFORE the exchange (see
  * SCALING.md §2 — on a versioned 100 TB fact this is the difference
  * between shuffling |keys| rows and shuffling everything). Spark 4's
  * own InferWindowGroupLimit mitigates the window plan with a per-key
  * group limit, but still sorts and still ships one row per key per
  * input partition through a Window operator; the aggregate plan needs
  * no sort at all. Users (and ported SQL from engines with
  * ReplacingMergeTree/argMax semantics — the reference's DDL:447-470)
  * overwhelmingly write the row_number idiom; this rule gives them the
  * `latestPerKey` plan automatically.
  *
  * Semantics: `row_number() = 1` picks one row per key; among ties in
  * the ordering the choice is already nondeterministic in the window
  * formulation, and stays nondeterministic (possibly different) in the
  * aggregate one. Row-atomicity is preserved — the aggregate is ONE
  * `max_by(struct(all columns), key)`, never per-column max.
  *
  * Conservative guards — the rewrite fires only when:
  *  - the Window computes exactly one expression: a row_number();
  *  - the filter compares it to 1 (`= 1`, `<= 1`, `< 2`; any side);
  *  - every ORDER BY direction is the same (a single min/max key — the
  *    struct ordering is lexicographic, so mixed directions cannot be
  *    expressed with one key);
  *  - every ORDER BY null ordering is the direction's DEFAULT
  *    (ASC+NULLS FIRST / DESC+NULLS LAST);
  *  - every ORDER BY expression is orderable as a struct field;
  *  - the partition keys are simple attributes, and there is at least
  *    one (a GLOBAL aggregate fabricates one all-null row on empty
  *    input, where the window formulation returns zero rows).
  *
  * Null order keys: `max_by` SKIPS rows whose key expression is null,
  * while `row_number` ranks them — so the aggregate key is the struct
  * `(isnotnull(k1), k1, isnotnull(k2), k2, …)`. The struct itself is
  * never null (nothing is skipped), and the boolean flags reproduce the
  * default null ranking exactly: under DESC/max, true > false puts
  * non-null keys first (NULLS LAST); under ASC/min, false < true puts
  * null keys first (NULLS FIRST). When two rows tie on a null key the
  * null fields compare equal and the next pair decides — the same
  * "arbitrary among ties" the window formulation already has.
  * The row_number column itself is re-emitted as literal 1, so plans
  * that project or reference it downstream stay valid.
  */
object RewriteLatestPerKey extends Rule[LogicalPlan] with PredicateHelper {

  private def rnPredicate(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, IntegerType)) => a.semanticEquals(rn)
    case GreaterThanOrEqual(Literal(1, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case LessThan(a: Attribute, Literal(2, IntegerType)) => a.semanticEquals(rn)
    case GreaterThan(Literal(2, IntegerType), a: Attribute) => a.semanticEquals(rn)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          orderSpec.forall(so => RowOrdering.isOrderable(so.child.dataType)) &&
          orderSpec.forall(so => so.nullOrdering == so.direction.defaultNullOrdering) &&
          orderSpec.map(_.direction).distinct.size == 1 &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) &&
          splitConjunctivePredicates(cond).count(rnPredicate(_, alias.toAttribute)) >= 1 &&
          splitConjunctivePredicates(cond).forall(p =>
            rnPredicate(p, alias.toAttribute) ||
              !p.references.contains(alias.toAttribute)) =>

      val rnAttr = alias.toAttribute
      val keyExpr = CreateStruct(
        orderSpec.flatMap(so => Seq(IsNotNull(so.child), so.child)).toList)
      val rowStruct = CreateStruct(child.output)
      val pick = orderSpec.head.direction match {
        case Ascending => MinBy(rowStruct, keyExpr)
        case Descending => MaxBy(rowStruct, keyExpr)
      }
      val latest = Alias(
        AggregateExpression(pick, Complete, isDistinct = false),
        "_graft_latest")()
      val agg = Aggregate(partitionSpec, Seq(latest), child)
      val latestAttr = latest.toAttribute
      // restore the original output: every child column extracted from
      // the picked row (same exprIds, so downstream references resolve),
      // plus the row_number column as the literal 1 it now always is
      val restored = child.output.zipWithIndex.map { case (a, i) =>
        Alias(GetStructField(latestAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
      } :+ Alias(Literal(1, IntegerType), rnAttr.name)(exprId = rnAttr.exprId)
      val projected = Project(restored, agg)
      val residual = splitConjunctivePredicates(cond)
        .filterNot(rnPredicate(_, rnAttr))
      residual match {
        case Nil => projected
        case ps => Filter(ps.reduce(And), projected)
      }
  }
}
