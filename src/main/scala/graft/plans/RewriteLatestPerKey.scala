package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Optimizer rule: rewrite the "top k rows per key" window idiom
  *
  * {{{ ... WHERE row_number() OVER (PARTITION BY k ORDER BY v DESC) <= K }}}
  *
  * into an aggregate — `max_by`/`min_by` over the whole row for K = 1,
  * the bounded-heap [[graft.functions.TopKRows]] kernel (+ posexplode)
  * for K ≥ 2.
  *
  * Why: the window formulation shuffles and SORTS every input row per
  * partition key before discarding all but K rows per key; the
  * aggregate formulation carries a partial aggregate, so every map task
  * reduces its share to ≤ K·|keys| rows BEFORE the exchange (see
  * SCALING.md §2 — on a versioned 100 TB fact this is the difference
  * between shuffling K·|keys| rows and shuffling everything). Spark 4's
  * own InferWindowGroupLimit mitigates the window plan with a per-key
  * group limit, but still sorts and still ships K rows per key per
  * input partition through a Window operator; the aggregate plan needs
  * no sort at all. Users (and ported SQL from engines with
  * ReplacingMergeTree/argMax semantics — the reference's DDL:447-470)
  * overwhelmingly write the row_number idiom, for rn = 1 and rn <= k
  * alike; this rule gives both the reducing-aggregate plan
  * automatically.
  *
  * Semantics: `row_number() <= K` picks K rows per key; among ties in
  * the ordering the choice is already nondeterministic in the window
  * formulation, and stays nondeterministic (possibly different) in the
  * aggregate one. Row-atomicity is preserved — the aggregate picks whole
  * rows (`max_by(struct(all columns), key)` / a heap of row structs),
  * never per-column max.
  *
  * Conservative guards — the rewrite fires only when:
  *  - the Window computes exactly one expression: a row_number();
  *  - the filter bounds it by a positive literal (`= 1`, `<= k`,
  *    `< k+1`; any side — `= k` for k > 1 is NOT a top-k and is left
  *    alone), with the tightest bound at most [[MaxK]] — beyond that the
  *    window plan's spillable sort is the safer execution;
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
  * Null order keys: `max_by` (and the TopKRows heap) SKIPS rows whose
  * key expression is null, while `row_number` ranks them — so the
  * aggregate key is the struct `(isnotnull(k1), k1, isnotnull(k2), k2,
  * …)`. The struct itself is never null (nothing is skipped), and the
  * boolean flags reproduce the default null ranking exactly: under
  * DESC/max, true > false puts non-null keys first (NULLS LAST); under
  * ASC/min, false < true puts null keys first (NULLS FIRST). When two
  * rows tie on a null key the null fields compare equal and the next
  * pair decides — the same "arbitrary among ties" the window
  * formulation already has.
  * The row_number column itself is re-emitted: as literal 1 for K = 1,
  * as `pos + 1` of the rank-ordered posexplode for K ≥ 2 — so plans
  * that project or reference it downstream stay valid.
  */
object RewriteLatestPerKey extends Rule[LogicalPlan] with PredicateHelper {

  /** Largest k the rewrite fires for. The heap aggregate holds k row
    * copies per group in executor memory and emits each group's rows as
    * ONE array — the right trade for top-k idioms (small k), the wrong
    * one for pagination-style `rn <= 10000000`, where the window plan's
    * spillable sort must be kept. 1024 covers every real top-k we have
    * seen while bounding the per-group buffer. */
  private val MaxK = 1024

  /** The row-count bound a conjunct puts on the row_number, if it is a
    * top-k-shaped predicate on `rn` and nothing else. */
  private def rnLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 1 => Some(k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && k >= 1 => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType))
      if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rn) && k >= 2 => Some(k - 1)
    case _ => None
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
          splitConjunctivePredicates(cond)
            .flatMap(rnLimit(_, alias.toAttribute)).exists(_ <= MaxK) &&
          splitConjunctivePredicates(cond).forall(p =>
            rnLimit(p, alias.toAttribute).isDefined ||
              !p.references.contains(alias.toAttribute)) =>

      val rnAttr = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      // several rn bounds conjoin to the tightest one
      val k = conjuncts.flatMap(rnLimit(_, rnAttr)).min
      val keyExpr = CreateStruct(
        orderSpec.flatMap(so => Seq(IsNotNull(so.child), so.child)).toList)
      val rowStruct = CreateStruct(child.output)
      val asc = orderSpec.head.direction == Ascending

      val projected = if (k == 1) {
        val pick = if (asc) MinBy(rowStruct, keyExpr) else MaxBy(rowStruct, keyExpr)
        val latest = Alias(
          AggregateExpression(pick, Complete, isDistinct = false),
          "_graft_latest")()
        val agg = Aggregate(partitionSpec, Seq(latest), child)
        val latestAttr = latest.toAttribute
        // restore the original output: every child column extracted from
        // the picked row (same exprIds, so downstream references
        // resolve), plus the row_number column as the literal 1 it now
        // always is
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(latestAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
        } :+ Alias(Literal(1, IntegerType), rnAttr.name)(exprId = rnAttr.exprId)
        Project(restored, agg)
      } else {
        val topk = Alias(
          AggregateExpression(
            graft.functions.TopKRows(rowStruct, keyExpr, k, asc),
            Complete, isDistinct = false),
          "_graft_topk")()
        val agg = Aggregate(partitionSpec, Seq(topk), child)
        // explode the rank-ordered array back into rows; pos+1 IS the
        // row_number (the kernel emits best-first)
        val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
        val rowAttr = AttributeReference("_graft_row",
          rowStruct.dataType.asInstanceOf[StructType], nullable = false)()
        val gen = Generate(PosExplode(topk.toAttribute),
          unrequiredChildIndex = Seq(0), outer = false, qualifier = None,
          generatorOutput = Seq(posAttr, rowAttr), child = agg)
        val restored = child.output.zipWithIndex.map { case (a, i) =>
          Alias(GetStructField(rowAttr, i, Some(a.name)), a.name)(exprId = a.exprId)
        } :+ Alias(Add(posAttr, Literal(1, IntegerType)), rnAttr.name)(exprId = rnAttr.exprId)
        Project(restored, gen)
      }

      val residual = conjuncts.filterNot(rnLimit(_, rnAttr).isDefined)
      residual match {
        case Nil => projected
        case ps => Filter(ps.reduce(And), projected)
      }
  }
}
