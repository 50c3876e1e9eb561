package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level DATA lineage over analyzed Catalyst plans — the governance
  * companion to [[ReadonlyGuard]] (what a query may touch) and
  * [[QueryMetrics]] (what it cost): for every output column of a query,
  * the set of physical source columns its VALUES transitively derive
  * from. This is what an org admin needs to answer "does this saved
  * query/sync target export anything derived from column X" before a
  * schema migration or a PII review — without reading the query.
  *
  * Scope: value lineage only. Filter/join/sort predicates are CONTROL
  * dependencies — they choose rows, not values — and are deliberately
  * excluded (the standard data-lineage contract; a predicate audit is
  * [[ReadonlyGuard]]'s table-level job). Walks Project/Aggregate/Window/
  * Generate/Expand/Union explicitly; every other operator passes its
  * child attributes through unchanged, which is exactly Catalyst's own
  * contract for them. The places TreeNode traversal loses track (the
  * round-2 lesson) are handled explicitly: subquery plans held by
  * expressions (a scalar subquery's VALUE is not an attribute reference)
  * and `WITH` clauses (a `CTERelationRef` is a LeafNode whose fresh
  * output attributes must be resolved POSITIONALLY through the
  * `CTERelationDef` body it references).
  */
object ColumnLineage {

  final case class SourceColumn(table: String, column: String) {
    override def toString: String = s"$table.$column"
  }

  /** Output column name -> physical source columns feeding its values.
    * Columns manufactured from literals/ids alone map to the empty set. */
  def lineage(df: DataFrame): Map[String, Set[SourceColumn]] = {
    val plan = df.queryExecution.analyzed
    val deps = walk(plan, Map.empty)
    plan.output.map(a => a.name -> deps.getOrElse(a.exprId, Set.empty)).toMap
  }

  /** Render for ops logs / review comments: one line per output column. */
  def render(df: DataFrame): String =
    lineage(df).toSeq.sortBy(_._1).map { case (c, srcs) =>
      s"$c <- ${if (srcs.isEmpty) "(none)" else srcs.toSeq.sortBy(_.toString).mkString(", ")}"
    }.mkString("\n")

  /** Per-CTE-definition positional output lineage, threaded down the walk
    * so every `CTERelationRef` (its output attrs are FRESH per reference)
    * can resolve through its definition's body. */
  private type CteMap = Map[Long, Seq[Set[SourceColumn]]]

  /** Bottom-up attribute dependency map. Attributes introduced by leaves
    * bind to their physical relation; attributes introduced by computing
    * operators bind to the union of their expressions' references,
    * resolved through the children's map. */
  private def walk(plan: LogicalPlan, ctes: CteMap): Map[ExprId, Set[SourceColumn]] = {
    // resolve CTE definitions FIRST (later defs may reference earlier
    // ones), then walk the main plan with all of them in scope
    val (cteMap, defDeps) = plan match {
      case w: WithCTE =>
        w.cteDefs.foldLeft((ctes, Map.empty[ExprId, Set[SourceColumn]])) {
          case ((m, acc), d) =>
            val dm = walk(d.child, m)
            val outs = d.child.output.map(a => dm.getOrElse(a.exprId, Set.empty[SourceColumn]))
            (m + (d.id -> outs), acc ++ dm)
        }
      case _ => (ctes, Map.empty[ExprId, Set[SourceColumn]])
    }
    val walkChildren = plan match {
      case w: WithCTE => Seq(w.plan)
      case p => p.children
    }
    val childMap: Map[ExprId, Set[SourceColumn]] =
      walkChildren.map(walk(_, cteMap)).foldLeft(defDeps)(_ ++ _)

    def refsOf(e: Expression): Set[SourceColumn] = {
      // recurse into subquery plans held by expressions — e.references
      // does not cross the PlanExpression boundary, and a scalar
      // subquery's VALUE is not an attribute reference at all, so the
      // subquery's own output lineage must be added explicitly
      var subValueDeps = Set.empty[SourceColumn]
      val subPlans = e.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
          pe.plan match {
            case lp: LogicalPlan =>
              val m = walk(lp, cteMap)
              subValueDeps ++= lp.output.flatMap(a => m.getOrElse(a.exprId, Set.empty))
              m
            case _ => Map.empty[ExprId, Set[SourceColumn]]
          }
      }.foldLeft(childMap)(_ ++ _)
      e.references.iterator
        .flatMap(a => subPlans.getOrElse(a.exprId, Set.empty[SourceColumn]))
        .toSet ++ subValueDeps
    }

    plan match {
      case ref: CTERelationRef =>
        // fresh attrs per reference: resolve positionally via the def body
        val outs = cteMap.getOrElse(ref.cteId, Seq.empty)
        ref.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> outs.lift(i).getOrElse(Set.empty[SourceColumn])
        }.toMap

      case _: WithCTE => childMap

      case lr: LogicalRelation =>
        val table = lr.catalogTable.map(_.identifier.unquotedString).orElse {
          lr.relation match {
            case fs: HadoopFsRelation =>
              fs.location.rootPaths.headOption.map { p =>
                val n = p.getName
                if (n.endsWith(".parquet")) n.dropRight(8) else n
              }
            case _ => None
          }
        }.getOrElse(lr.relation.toString)
        lr.output.map(a => a.exprId -> Set(SourceColumn(table, a.name))).toMap

      case leaf: LeafNode =>
        // LocalRelation / LogicalRDD / streaming sources: opaque physical
        // origin — name the node so the report says WHERE lineage stops
        leaf.output.map(a =>
          a.exprId -> Set(SourceColumn(leaf.nodeName.toLowerCase, a.name))).toMap

      case Project(list, _) =>
        childMap ++ named(list, refsOf)

      case agg: Aggregate =>
        childMap ++ named(agg.aggregateExpressions, refsOf)

      case w: Window =>
        childMap ++ named(w.windowExpressions, refsOf)

      case g: Generate =>
        // every generated column derives from the generator's inputs
        val gen = refsOf(g.generator)
        childMap ++ g.generatorOutput.map(a => a.exprId -> gen).toMap

      case e: Expand =>
        // output(i) derives from column i of every projection row
        childMap ++ e.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> e.projections.flatMap(p => refsOf(p(i))).toSet
        }.toMap

      case u: Union =>
        // analyzed Union output attrs are fresh: position i merges every
        // child's column i
        childMap ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.flatMap(c =>
            childMap.getOrElse(c.output(i).exprId, Set.empty[SourceColumn])).toSet
        }.toMap

      case _ =>
        // Filter/Join/Sort/Limit/Distinct/SubqueryAlias/...: attributes
        // pass through by exprId; nothing new is computed
        childMap
    }
  }

  private def named(list: Seq[NamedExpression],
                    refs: Expression => Set[SourceColumn]): Map[ExprId, Set[SourceColumn]] =
    list.map(ne => ne.exprId -> refs(ne)).toMap
}
