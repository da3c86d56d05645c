package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rule: dedupe-before-tag. Rewrites
 *
 *   Project[..., f(tag_envo(text)), ...](child)
 *
 * into
 *
 *   Project[..., f(tagged), ...](
 *     Join(child, Project[tagged = tag_envo(t)](
 *       Aggregate[groupBy text](text as t)), on child.text <=> t))
 *
 * i.e. the reference's "tag only DISTINCT source texts, join results back"
 * pattern (seqenv add_tagger_results.py:114-134,159-167) applied
 * automatically by Catalyst whenever the input repeats texts — the single
 * biggest lever on duplicated transcript corpora (SURVEY §4). Enabled via
 * `spark.graft.autoDistinctTag=true` (off by default: MentionDetect picks
 * its strategy explicitly; the rule serves ad-hoc tag_envo projections and
 * SQL users).
 *
 * Correctness notes: the join is on null-safe TEXT equality (no
 * hash-collision exposure); tag_envo is deterministic and null-propagating,
 * and every input row finds exactly one distinct-side partner, so row
 * multiplicity is preserved.
 */
object AutoDistinctTag extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.autoDistinctTag"
  private val MarkerName = "__graft_distinct_text"
  private val TaggedName = "__graft_tagged"

  private def enabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(ConfKey, "false").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case p @ Project(projectList, child) if !alreadyRewritten(p) =>
        val tagCalls = projectList.flatMap(_.collect { case t: TagEnvoMentions => t }).distinct
        tagCalls match {
          case Seq(tag @ TagEnvoMentions(textExpr))
              if textExpr.deterministic &&
                textExpr.references.subsetOf(child.outputSet) &&
                // never re-enter the rule's own emitted projections (the
                // optimizer batch may run to fixed point)
                !textExpr.references.exists(_.name == MarkerName) &&
                !projectList.exists(_.name == TaggedName) =>
            rewrite(projectList, child, tag, textExpr)
          case _ => p
        }
    }
  }

  /** Only the Project this rule itself just emitted (whose child is the
    * rewrite's Join over the tagged-distinct Project) is skipped — an
    * unrelated tag_envo projection HIGHER in the same tree must still be
    * rewritten, so the guard must not scan the whole subtree. */
  private def alreadyRewritten(p: Project): Boolean = p.child match {
    case Join(_, Project(pl, _: Aggregate), _, _, _) =>
      pl.exists(_.name == TaggedName)
    case _ => false
  }

  private def rewrite(projectList: Seq[NamedExpression], child: LogicalPlan,
                      tag: TagEnvoMentions, textExpr: Expression): LogicalPlan = {
    // distinct texts: Aggregate(groupBy textExpr, first(textExpr) as marker)
    val distinctText = Alias(
      First(textExpr, ignoreNulls = false).toAggregateExpression(), MarkerName)()
    val agg = Aggregate(Seq(textExpr), Seq(distinctText), child)
    // tagged side: (marker_text, tagged_mentions)
    val taggedAlias = Alias(TagEnvoMentions(distinctText.toAttribute), TaggedName)()
    val tagged = Project(Seq(distinctText.toAttribute, taggedAlias), agg)
    // join back on null-safe text equality
    val joinCond = EqualNullSafe(textExpr, distinctText.toAttribute)
    val joined = Join(child, tagged, Inner, Some(joinCond), JoinHint.NONE)
    // original project list with the tag call replaced by the joined attr
    val newList = projectList.map { ne =>
      ne.transform { case t: TagEnvoMentions if t == tag => taggedAlias.toAttribute }
        .asInstanceOf[NamedExpression]
    }
    Project(newList, joined)
  }
}
