package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, CurrentRow, EqualTo, Expression, LessThan, LessThanOrEqual, Literal, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: recognize the ubiquitous top-k-per-group idiom
  *
  *   `… row_number() OVER (PARTITION BY g ORDER BY o) AS rn … WHERE rn <= k`
  *
  * and rewrite it to the native bounded-selection operator
  * ([[TopKPerGroupPlan]]), whose partial/final execution shuffles at most
  * k rows per group per map partition instead of the whole table (see
  * `TopKPerGroup.scala`). Registered through `graft.GraftExtensions`
  * (`injectOptimizerRule`), with the matching planner strategy.
  *
  * Scope is deliberately conservative — the rewrite fires only when it is
  * provably the same computation:
  *  - exactly one window expression, and it is `row_number()` with the
  *    default (UNBOUNDED PRECEDING, CURRENT ROW) row frame;
  *  - partition and order keys are plain attributes (no computed keys);
  *  - the filter is a sole `rn <= k` / `rn < k` / `rn = 1` comparison
  *    (optionally under a pass-through Project), with constant k ≥ 1.
  * Ties under a non-total ORDER BY are resolved arbitrarily — exactly the
  * contract `row_number()` already has.
  */
object RewriteTopKWindow extends Rule[LogicalPlan] {

  private val RowNumberFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  /** Group-key types the bounded operator may hash raw: floating types are
    * excluded (the window path normalizes -0.0/0.0 and NaN bit patterns via
    * NormalizeFloatingNumbers, which runs AFTER this rule — raw UnsafeRow
    * hashing would split those into distinct groups), as are nested types
    * that could embed a float. */
  private def safeKeyType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => false
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           StringType | BinaryType | DateType | TimestampType |
           TimestampNTZType | _: DecimalType => true
      case _ => false
    }
  }

  /** (rank attribute, group attributes, ordering) when the window is the
    * exact row_number shape. */
  private def rowNumberWindow(w: Window): Option[(AttributeReference, Seq[Attribute], Seq[SortOrder])] =
    w match {
      case Window(Seq(a @ Alias(
            WindowExpression(RowNumber(), WindowSpecDefinition(part, order, RowNumberFrame)),
            _)), _, _, _, _)
          if part.nonEmpty &&
            part.forall(e => e.isInstanceOf[Attribute] && safeKeyType(e.dataType)) &&
            order.nonEmpty && order.forall(_.child.isInstanceOf[Attribute]) =>
        Some((a.toAttribute.asInstanceOf[AttributeReference],
          part.map(_.asInstanceOf[Attribute]), order))
      case _ => None
    }

  /** k for conditions equivalent to `rank <= k` on the given attribute. */
  private def boundFor(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, Literal(k: Int, IntegerType)) if r.semanticEquals(rank) => Some(k)
    case LessThan(r: Attribute, Literal(k: Int, IntegerType))
        if r.semanticEquals(rank) && k > Int.MinValue => Some(k - 1)
    case EqualTo(r: Attribute, Literal(1, IntegerType)) if r.semanticEquals(rank) => Some(1)
    case _ => None
  }

  private def rewrite(w: Window, cond: Expression): Option[LogicalPlan] =
    rowNumberWindow(w).flatMap { case (rank, groups, order) =>
      boundFor(cond, rank).filter(_ >= 1).map { k =>
        TopKPerGroupPlan(groups, order, k, rank, w.child)
      }
    }

  /** The window under any chain of pass-through (attribute-only) Projects —
    * `withColumn`/`select` layering that CollapseProject may not have
    * merged yet when this rule runs. */
  private def unwrap(p: LogicalPlan): Option[Window] = p match {
    case w: Window => Some(w)
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      unwrap(child).flatMap { w =>
        rewrite(w, cond).map { topk =>
          // preserve the filter child's exact output (the projects may have
          // dropped or reordered columns relative to the operator's output)
          if (child eq w) topk
          else Project(child.output.map(a => a: org.apache.spark.sql.catalyst.expressions.NamedExpression), topk)
        }
      }.getOrElse(f)
  }
}
