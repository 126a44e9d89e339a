package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Exists, Expression, Literal, Or, OuterReference}
import org.apache.spark.sql.catalyst.planning.GroupBasedRowLevelOperation
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, MergeRows, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Runtime group filtering for `WHEN NOT MATCHED BY SOURCE` merges —
  * the rewrite-narrowing Spark itself stops short of.
  *
  * Spark's `RewriteMergeIntoTable` synthesizes a `groupFilterCondition`
  * (an EXISTS over the source on the ON condition) only when a MERGE has
  * NO by-source clauses; with them, every unmatched target row is
  * potentially affected, so it plans a full-table copy-on-write —
  * `ReplaceData(condition = true, groupFilterCondition = None)` — and
  * `RowLevelOperationRuntimeGroupFiltering` never fires. That is honest
  * for an UNCONDITIONED by-source clause, but a CONDITIONED one (`WHEN
  * NOT MATCHED BY SOURCE AND <cond> THEN …`, Delta's documented form)
  * bounds the affected rows by construction: a target row is touched iff
  * it matches the source (ON) or satisfies some by-source clause
  * condition. Files provably containing neither kind of row need not be
  * rewritten — at 100 TB the difference between rewriting 0.1% of a
  * table and all of it.
  *
  * This rule fills the gap for graftlake tables only: when every
  * by-source AFFECT instruction (context ≠ Copy — the catch-all copy is
  * how COW keeps unaffected rows) carries a real condition over target
  * columns, it sets
  *
  * {{{ groupFilterCondition = EXISTS(source WHERE on) OR cond₁ OR … }}}
  *
  * and a matching non-trivial `condition`, which is exactly the shape
  * Spark's own `RowLevelOperationRuntimeGroupFiltering` (one batch
  * later, in PartitionPruning) consumes: it builds the matching-rows
  * subquery, feeds the `_file` values to the scan's
  * `SupportsRuntimeFiltering`, and the commit then replaces only the
  * surviving files ([[graft.sources.GraftLakeRowOps]]). Soundness: the
  * narrowed file set is a SUPERSET of every affected row's file — a
  * source row whose only match lives in a skipped file cannot exist
  * (that target row satisfies the EXISTS disjunct, so its file is
  * selected), and unscanned files stay in the manifest verbatim.
  * Unconditioned by-source clauses, non-target-column conditions, or
  * any unexpected plan shape leave the plan untouched (full rewrite —
  * Spark's behavior today). */
object BoundBySourceMerge extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.runtimeRowLevelOperationGroupFilterEnabled) plan
    else plan.transformDown {
      case GroupBasedRowLevelOperation(rd, Literal.TrueLiteral, None, readRel)
          if isGraftOperation(readRel) =>
        bound(rd, readRel).getOrElse(rd)
    }

  /** The operator-optimization batch runs BEFORE scan planning, so the
    * read relation is still a [[DataSourceV2Relation]] over the
    * RowLevelOperationTable (the ScanRelation form appears one batch
    * later) — recognize ours in either form. */
  private def isGraftOperation(rel: LogicalPlan): Boolean = rel match {
    case r: DataSourceV2Relation =>
      // RowLevelOperationTable is private[sql] at the Scala level; its
      // `operation` accessor is public bytecode — one reflective call at
      // planning time, guarded so any mismatch just means "not ours"
      val t = r.table
      t.getClass.getName.endsWith(".RowLevelOperationTable") &&
        (try t.getClass.getMethod("operation").invoke(t)
          .isInstanceOf[graft.sources.GraftLakeRowLevelOperation]
        catch { case _: ReflectiveOperationException => false })
    case r: DataSourceV2ScanRelation =>
      r.scan.isInstanceOf[graft.sources.GraftLakeScan]
    case _ => false
  }

  private def bound(rd: ReplaceData,
                    readRel: LogicalPlan): Option[ReplaceData] = {
    // exactly one MergeRows over a full-outer join — the by-source COW
    // shape RewriteMergeIntoTable plans; anything else stays untouched
    val merges = rd.query.collect { case m: MergeRows => m }
    if (merges.length != 1) return None
    val m = merges.head
    // the full-outer join sits under the marker Project(s) RewriteMerge-
    // IntoTable adds (row-presence flags); attribute references pass
    // through those unchanged
    def findJoin(p: LogicalPlan): Option[Join] = p match {
      case j: Join => Some(j)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
        findJoin(pr.child)
      case _ => None
    }
    // by-source merges keep every target row: FULL OUTER when the merge
    // also inserts, LEFT OUTER (target left) when it doesn't
    val join = findJoin(m.child) match {
      case Some(j) if j.condition.isDefined &&
        (j.joinType == FullOuter || j.joinType == LeftOuter ||
          j.joinType == RightOuter) => j
      case _ => return None
    }
    def contains(side: LogicalPlan): Boolean =
      side.collectFirst { case r if r eq readRel => () }.isDefined
    val srcSide =
      if (contains(join.left) && join.joinType != RightOuter) join.right
      else if (contains(join.right) && join.joinType != LeftOuter) join.left
      else return None
    // AFFECT instructions of the by-source branch: everything except the
    // catch-all copy. Each must carry a real condition over the TARGET's
    // columns — an unconditioned clause touches every unmatched row and
    // nothing can be narrowed.
    val affect: Seq[Expression] = m.notMatchedBySourceInstructions.collect {
      case k: MergeRows.Keep if k.context != MergeRows.Copy => k.condition
      case i: MergeRows.Instruction if !i.isInstanceOf[MergeRows.Keep] =>
        i.condition
    }
    if (affect.isEmpty) return None
    if (affect.exists(c => c == Literal.TrueLiteral ||
        !c.references.subsetOf(readRel.outputSet))) return None
    val onCond = join.condition.get
    if (!onCond.references.subsetOf(readRel.outputSet ++ srcSide.outputSet))
      return None
    // the group filter re-EVALUATES these conditions against a separate
    // scan of the target: a non-deterministic condition (rand() passes
    // the reference guards — it references nothing) could disagree
    // between the two evaluations and silently skip files whose rows
    // would match at MergeRows time. Spark's analyzer usually rejects
    // non-deterministic merge conditions, but this rule must not lean on
    // that upstream invariant.
    if (!onCond.deterministic || affect.exists(!_.deterministic)) return None
    // the EXISTS disjunct — the same construction RewriteMergeIntoTable's
    // toGroupFilterCondition uses for matched-only merges: target columns
    // become outer references into a filter over the source
    val onWithOuter = onCond.transformUp {
      case a: Attribute if readRel.outputSet.contains(a) => OuterReference(a)
    }
    val outerRefs = onWithOuter.collect {
      case OuterReference(a: Attribute) => a
    }
    val rawCond = (Exists(Filter(onWithOuter, srcSide), outerRefs) +: affect)
      .reduceLeft[Expression](Or(_, _))
    // the optimizer's decorrelation batch (PullupCorrelatedPredicates)
    // already ran — a freshly-built correlated Exists must be pulled up
    // the same way or RewriteSubquery trips over it later. Run the rule
    // over a synthetic Filter carrying the condition; it rewrites the
    // subquery in place and leaves the expression in the decorrelated
    // form Spark's own analyzer-built group filters arrive in.
    val groupCond = org.apache.spark.sql.catalyst.optimizer
      .PullupCorrelatedPredicates(Filter(rawCond, readRel)) match {
      case f: Filter => f.condition
      case _ => return None
    }
    Some(rd.copy(condition = groupCond, groupFilterCondition = Some(groupCond)))
  }
}
