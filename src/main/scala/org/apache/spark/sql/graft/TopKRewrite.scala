package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Optimizer rule: rewrite the window top-k-per-group pattern
  *
  *   Project(out, Filter(rn <= k,
  *     Window(rn := row_number() OVER (PARTITION BY g ORDER BY v DESC, id))))
  *
  * into the partial-combinable aggregate
  *
  *   Project(out', Generate(posexplode(tk),
  *     Aggregate(g, graft_topk(v, id, k) AS tk)))
  *
  * Window + Filter shuffles and sorts EVERY row of every partition to
  * keep k; the aggregate form sends ≤ k·partitions pairs per group
  * across the exchange (Spark's own WindowGroupLimit trims the sort but
  * still shuffles all rows). The rewrite fires only when it is provably
  * lossless:
  *   - the single window expression is row_number with the default
  *     ROWS UNBOUNDED PRECEDING..CURRENT ROW frame;
  *   - ORDER BY is (v DESC NULLS LAST, id ASC NULLS FIRST) — graft_topk's
  *     total order — with v: double, id: non-nullable bigint (a nullable
  *     id could legally out-rank rows under NULLS FIRST, which the
  *     aggregate cannot represent: decline, stay correct);
  *   - partition keys are plain attributes;
  *   - the projection consumes only {partition keys, rn, v, id} — any
  *     other payload column cannot ride through the aggregate.
  * Everything else is left untouched. Results are bit-identical
  * (TopKRewriteSpec asserts plan shape and result equality, including
  * null v ordering).
  *
  * Enable per session via `TopKRewrite.enable(spark)` (runtime,
  * `spark.experimental.extraOptimizations`) or for all sessions via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(winAlias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(_, _, frame)), _)),
            partSpec, orderSpec, child, _))) =>
      rewrite(projList, cond, winAlias, frame, partSpec, orderSpec, child)
        .getOrElse(p)
  }

  private def limitFromCond(cond: Expression, rn: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) && k > 0 => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) && k > 1 => Some(k - 1)
      case EqualTo(a: Attribute, Literal(k: Int, IntegerType))
          if a.semanticEquals(rn) && k == 1 => Some(1)
      case _ => None
    }

  private def rewrite(projList: Seq[NamedExpression], cond: Expression,
                      winAlias: Alias, frame: Expression,
                      partSpec: Seq[Expression], orderSpec: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val rnAttr = winAlias.toAttribute
    val defaultFrame = frame match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
        true
      case _: UnspecifiedFrame.type => true
      case _ => false
    }
    val groupAttrs: Option[Seq[AttributeReference]] =
      if (partSpec.forall(_.isInstanceOf[AttributeReference]))
        Some(partSpec.map(_.asInstanceOf[AttributeReference]))
      else None
    (limitFromCond(cond, rnAttr), orderSpec, groupAttrs) match {
      case (Some(k),
          Seq(SortOrder(v: AttributeReference, Descending, NullsLast, _),
            SortOrder(id: AttributeReference, Ascending, NullsFirst, _)),
          Some(gs))
          if defaultFrame && v.dataType == DoubleType &&
            id.dataType == LongType && !id.nullable =>
        val structType = StructType(Seq(
          StructField("v", DoubleType, nullable = true),
          StructField("id", LongType, nullable = false)))
        val tk = Alias(
          TopKPairs(v, id, k).toAggregateExpression(), "__tk")()
        // InferWindowGroupLimit may already have inserted a
        // WindowGroupLimit below the Window; its pruning (rank > limit
        // can never surface) is subsumed by the aggregate's k-bounded
        // heaps, so strip it when it is at least as permissive as k.
        val aggChild = child match {
          case WindowGroupLimit(_, _, RowNumber(), limit, grandchild)
              if limit >= k => grandchild
          case other => other
        }
        val agg =
          Aggregate(gs, (gs: Seq[NamedExpression]) :+ tk, aggChild, None)
        val posAttr = AttributeReference("pos", IntegerType,
          nullable = false)()
        val colAttr = AttributeReference("col", structType,
          nullable = false)()
        val gen = Generate(PosExplode(tk.toAttribute),
          unrequiredChildIndex = Seq(gs.size), outer = false,
          qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)
        // re-emit the original output attributes (same exprIds) so the
        // parent plan's references stay valid
        def remap(a: Attribute, name: String, exprId: ExprId)
            : Option[NamedExpression] =
          if (gs.exists(_.semanticEquals(a)))
            Some(Alias(gs.find(_.semanticEquals(a)).get, name)(exprId))
          else if (a.semanticEquals(rnAttr))
            Some(Alias(Add(posAttr, Literal(1)), name)(exprId))
          else if (a.semanticEquals(v))
            Some(Alias(GetStructField(colAttr, 0, Some("v")), name)(exprId))
          else if (a.semanticEquals(id))
            Some(Alias(GetStructField(colAttr, 1, Some("id")), name)(exprId))
          else None
        val outs = projList.map {
          case a: AttributeReference => remap(a, a.name, a.exprId)
          case al @ Alias(a: AttributeReference, name) =>
            remap(a, name, al.exprId)
          case _ => None
        }
        if (outs.forall(_.isDefined)) Some(Project(outs.map(_.get), gen))
        else None
      case _ => None
    }
  }
}

/** Runtime enabler for sessions not built with GraftExtensions. */
object TopKRewrite {
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations = cur :+ TopKRewriteRule
  }
  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == TopKRewriteRule)
}
