package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Optimizer rule: rewrite the window top-k-per-group pattern
  *
  *   Project(out, Filter(rk <= k,
  *     Window(rk := {row_number|rank|dense_rank}()
  *       OVER (PARTITION BY g ORDER BY v DESC, id))))
  *
  * into a partial-combinable aggregate
  *
  *   Project(out', Generate(posexplode(tk),
  *     Aggregate(g, graft_topk[_rows](v, id, [payload,] k) AS tk)))
  *
  * Window + Filter shuffles and sorts EVERY row of every partition to
  * keep k; the aggregate form sends ≤ (k + tie overhang)·partitions
  * rows per group across the exchange (Spark's own WindowGroupLimit
  * trims the sort but still shuffles all rows). The rewrite fires only
  * when it is provably lossless:
  *   - the single window expression is row_number, rank, or dense_rank
  *     with its default frame;
  *   - ORDER BY is (v DESC NULLS LAST, id ASC NULLS FIRST) — the
  *     aggregates' total order — with v: double, id: bigint (both may
  *     be nullable: graft_topk_rows models null ids under NULLS FIRST
  *     explicitly, which matters because every parquet-backed column is
  *     nullable — a non-null-only rule would never fire on real tables);
  *   - partition keys are plain attributes;
  *   - every projected column is a plain attribute (or alias of one):
  *     {partition keys, rk, v, id} map onto aggregate outputs, any
  *     OTHER child attribute rides through as a payload struct in
  *     graft_topk_rows.
  * The no-payload, non-nullable-id row_number case keeps the minimal
  * heap-of-pairs aggregate (graft_topk); every other eligible shape uses the ranked
  * payload-carrying graft_topk_rows, whose retained set reproduces
  * rank/dense_rank boundary-tie semantics exactly. Everything else is
  * left untouched. Results are bit-identical (TopKRewriteSpec asserts
  * plan shape and result equality, including null v ordering and
  * boundary ties).
  *
  * Enable per session via `TopKRewrite.enable(spark)` (runtime,
  * `spark.experimental.extraOptimizations`) or for all sessions via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(winAlias @ Alias(WindowExpression(wf,
              WindowSpecDefinition(_, _, frame)), _)),
            partSpec, orderSpec, child, _)))
        if modeOf(wf).isDefined =>
      rewrite(projList, cond, winAlias, modeOf(wf).get, frame, partSpec,
        orderSpec, child)
        .getOrElse(p)
  }

  /** 0 = row_number, 1 = rank, 2 = dense_rank (graft_topk_rows modes). */
  private def modeOf(wf: Expression): Option[Int] = wf match {
    case RowNumber() => Some(0)
    case _: Rank => Some(1)
    case _: DenseRank => Some(2)
    case _ => None
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
                      winAlias: Alias, mode: Int, frame: Expression,
                      partSpec: Seq[Expression], orderSpec: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val rnAttr = winAlias.toAttribute
    // row_number resolves to ROWS unbounded..current; rank/dense_rank to
    // RANGE unbounded..current — both are the functions' required frames,
    // any other explicit frame is an analysis error anyway.
    val defaultFrame = frame match {
      case SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow) => true
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
            id.dataType == LongType =>
        // payload: projected columns beyond {group keys, rn, v, id} ride
        // through the aggregate as a struct — but only if they are plain
        // child outputs (an expression of them could be computed after
        // the Generate, but the original attribute wouldn't exist).
        val known = (a: Attribute) =>
          gs.exists(_.semanticEquals(a)) || a.semanticEquals(rnAttr) ||
            a.semanticEquals(v) || a.semanticEquals(id)
        val payloadAttrs: Seq[AttributeReference] = projList.flatMap {
          case a: AttributeReference if !known(a) => Seq(a)
          case Alias(a: AttributeReference, _) if !known(a) => Seq(a)
          case _ => Seq.empty
        }.foldLeft(Seq.empty[AttributeReference]) { (acc, a) =>
          if (acc.exists(_.semanticEquals(a))) acc else acc :+ a
        }
        val payloadOk = payloadAttrs.forall(a =>
          child.outputSet.contains(a))
        val projectable = projList.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case _ => false
        }
        if (!payloadOk || !projectable) return None

        // InferWindowGroupLimit may already have inserted a
        // WindowGroupLimit below the Window; its pruning (rows that can
        // never reach rank ≤ limit) is subsumed by the aggregate's
        // bounded buffers, so strip it when at least as permissive as k.
        val aggChild = child match {
          case WindowGroupLimit(_, _, _, limit, grandchild)
              if limit >= k => grandchild
          case other => other
        }

        if (payloadAttrs.isEmpty && mode == 0 && !id.nullable) {
          // proven minimal path: heap-of-pairs aggregate
          val structType = StructType(Seq(
            StructField("v", DoubleType, nullable = true),
            StructField("id", LongType, nullable = false)))
          val tk = Alias(
            TopKPairs(v, id, k).toAggregateExpression(), "__tk")()
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
        } else {
          // general path: ranked, payload-carrying aggregate
          val payloadType = StructType(payloadAttrs.map(a =>
            StructField(a.name, a.dataType, a.nullable)))
          val elemType = StructType(Seq(
            StructField("v", DoubleType, nullable = true),
            StructField("id", LongType, nullable = true),
            StructField("rk", IntegerType, nullable = false),
            StructField("p", payloadType, nullable = false)))
          val payloadStruct = CreateNamedStruct(payloadAttrs.flatMap(a =>
            Seq(Literal(a.name), a)))
          val tk = Alias(
            TopKRows(v, id, payloadStruct, k, mode)
              .toAggregateExpression(), "__tk")()
          val agg =
            Aggregate(gs, (gs: Seq[NamedExpression]) :+ tk, aggChild, None)
          val posAttr = AttributeReference("pos", IntegerType,
            nullable = false)()
          val colAttr = AttributeReference("col", elemType,
            nullable = false)()
          val gen = Generate(PosExplode(tk.toAttribute),
            unrequiredChildIndex = Seq(gs.size), outer = false,
            qualifier = None, generatorOutput = Seq(posAttr, colAttr), agg)
          val pStruct = GetStructField(colAttr, 3, Some("p"))
          def remap(a: Attribute, name: String, exprId: ExprId)
              : Option[NamedExpression] =
            if (gs.exists(_.semanticEquals(a)))
              Some(Alias(gs.find(_.semanticEquals(a)).get, name)(exprId))
            else if (a.semanticEquals(rnAttr))
              Some(Alias(GetStructField(colAttr, 2, Some("rk")), name)(exprId))
            else if (a.semanticEquals(v))
              Some(Alias(GetStructField(colAttr, 0, Some("v")), name)(exprId))
            else if (a.semanticEquals(id))
              Some(Alias(GetStructField(colAttr, 1, Some("id")), name)(exprId))
            else payloadAttrs.zipWithIndex
              .find { case (pa, _) => pa.semanticEquals(a) }
              .map { case (pa, i) =>
                Alias(GetStructField(pStruct, i, Some(pa.name)), name)(exprId)
              }
          val outs = projList.map {
            case a: AttributeReference => remap(a, a.name, a.exprId)
            case al @ Alias(a: AttributeReference, name) =>
              remap(a, name, al.exprId)
            case _ => None
          }
          if (outs.forall(_.isDefined)) Some(Project(outs.map(_.get), gen))
          else None
        }
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
