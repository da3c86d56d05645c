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
      case p @ Project(projectList, child)
          // never re-enter the rule's own emitted projections (the
          // optimizer batch may run to fixed point)
          if !projectList.exists(ne =>
            ne.name == TaggedName || ne.references.exists(_.name == MarkerName)) =>
        // a collapsed projection may hold SEVERAL distinct tag calls
        // (CollapseProject merges stacked selects) — chain one dedupe-join
        // per call; each join only ADDS a column, so later calls' text
        // expressions still resolve against the original child attributes
        val tagCalls = projectList
          .flatMap(_.collect { case t: TagEnvoMentions => t }).distinct
          .filter(t => t.child.deterministic &&
            t.child.references.subsetOf(child.outputSet))
        if (tagCalls.isEmpty) p
        else {
          var current: LogicalPlan = child
          var newList = projectList
          tagCalls.foreach { tag =>
            val (joined, taggedAttr) = rewriteOne(current, tag)
            current = joined
            newList = newList.map { ne =>
              ne.transform { case t: TagEnvoMentions if t == tag => taggedAttr }
                .asInstanceOf[NamedExpression]
            }
          }
          Project(newList, current)
        }
    }
  }

  /** Build distinct-texts Aggregate + tag Project + join-back over `base`;
    * returns the joined plan and the tagged output attribute. The rebuilt
    * tag call carries the ORIGINAL call's injected dictionary (if any). */
  private def rewriteOne(base: LogicalPlan, tag: TagEnvoMentions): (LogicalPlan, Attribute) = {
    val textExpr = tag.child
    val distinctText = Alias(
      First(textExpr, ignoreNulls = false).toAggregateExpression(), MarkerName)()
    val agg = Aggregate(Seq(textExpr), Seq(distinctText), base)
    val taggedAlias = Alias(TagEnvoMentions(distinctText.toAttribute, tag.dict), TaggedName)()
    val tagged = Project(Seq(distinctText.toAttribute, taggedAlias), agg)
    val joinCond = EqualNullSafe(textExpr, distinctText.toAttribute)
    val joined = Join(base, tagged, Inner, Some(joinCond), JoinHint.NONE)
    (joined, taggedAlias.toAttribute)
  }
}
