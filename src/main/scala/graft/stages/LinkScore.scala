package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dict.EnvoDict

/** Scoring configuration — mirrors the reference's flags and defaults
  * (seqenv/analysis.py:88-146: normalization ∈ {flat,ui,upui},
  * proportional=true, backtracking=false, restrict=None). */
final case class ScoreConfig(
    normalization: String = "flat",
    proportional: Boolean = true,
    backtracking: Boolean = false,
    restrict: Option[Int] = None) {
  require(Set("flat", "ui", "upui").contains(normalization),
    s"normalization must be flat|ui|upui, got $normalization")
}

/**
 * Stage 2 — entity-link scoring: the reference's `seq_to_counts` engine
 * (seqenv/analysis.py:338-408) recast as Catalyst groupBy-aggs per conv_id.
 *
 * Correspondence: conv_id ≈ seq, turn ≈ GI hit, text_hash ≈ isolation key,
 * tool ≈ pubmed id. Normalizations:
 *  - flat: every turn's envo occurrences counted (duplicates kept);
 *  - ui:   duplicate texts within a conversation counted once
 *          (set-of-isokeys, analysis.py:363-369);
 *  - upui: dedupe by text keeping the FIRST turn, then among survivors
 *          dedupe by tool keeping the first, null-tool rows all kept
 *          (analysis.py:382-403). The reference's "first" is dict insertion
 *          order; we pin the deterministic analog: order by turn_idx.
 *
 * Scale notes (10^12 turns): everything below is partial+final hash
 * aggregation or window-over-(conv_id,…) — no driver-side state, no
 * collect. The occurrence count per (conv_id, envo) is aggregated BEFORE
 * the per-conv total is computed, so a mega-conversation collapses to at
 * most ~1.6k rows (|EnvO|) ahead of the per-conv join — map-side combine
 * absorbs the skew that a naive window-count over raw occurrences would
 * concentrate on one partition.
 */
object LinkScore {

  /** input: envoRows(conv_id, turn_idx, tool, text_hash, …, envo:int) —
    * one row per envo occurrence (MentionDetect.envoRows)
    * output: (conv_id, envo:int, score:double) */
  def score(spark: SparkSession, envoRows: DataFrame, dict: EnvoDict,
            cfg: ScoreConfig): DataFrame = {

    // --- normalization: choose the surviving TURNS. keep-first is
    //     implemented as two-level agg + join-back on (keys, min) rather
    //     than a window: partial aggregation absorbs a conversation that
    //     repeats one text millions of times, and the join key includes
    //     turn_idx so hot groups spread across reducers (Salting notes).
    //     Duplicate texts carry identical envo multisets, so keeping the
    //     min-turn representative is equivalent to the reference's
    //     set-of-isokeys / keep-first semantics.
    //     Hash-width note: dedup keys on the 64-bit text_hash WITHOUT the
    //     text. Unlike MentionDetect's global join-back (birthday paradox
    //     over ALL distinct corpus texts — text equality required there),
    //     this collision space is per-conversation: two different texts
    //     must collide within ONE conv_id to mis-dedupe. At 10^12 turns /
    //     10^9 convs the expected number of affected conversations is
    //     ~sum(T_c^2)/2^65 ≈ 10^-5 — accepted, and cheaper than carrying
    //     text bytes through the hot projection. ---
    val survivors = cfg.normalization match {
      case "flat" => envoRows
      case "ui" =>
        Salting.keepFirstByAgg(envoRows, Seq("conv_id", "text_hash"), "turn_idx")
      case "upui" =>
        val firstPerText =
          Salting.keepFirstByAgg(envoRows, Seq("conv_id", "text_hash"), "turn_idx")
        // tool-dedup keeps the first turn per (conv, tool) among text-
        // survivors; null-tool rows all bypass (seqenv/analysis.py:391-392)
        val nullTool = firstPerText.filter(col("tool").isNull)
        val withTool = firstPerText.filter(col("tool").isNotNull)
        Salting.keepFirstByAgg(withTool, Seq("conv_id", "tool"), "turn_idx")
          .unionByName(nullTool)
    }

    // --- envo occurrences (duplicates within a turn kept) ---
    val occurrences = survivors.select(col("conv_id"), col("envo"))

    // --- backtracking: each occurrence also contributes one occurrence of
    //     every ancestor (documented intent of analysis.py:371-372; the
    //     closure table replaces the reference's child_to_parents) ---
    val withAncestors =
      if (!cfg.backtracking) occurrences
      else {
        val closureDf = closureFrame(spark, dict)
        occurrences.unionByName(
          occurrences
            .join(broadcast(closureDf), col("envo") === col("child"))
            .select(col("conv_id"), col("ancestor").as("envo")))
      }

    // --- restrict: keep strict descendants of the restrict term
    //     (analysis.py:373-374; the restrict node itself is dropped) ---
    val restricted = cfg.restrict match {
      case None => withAncestors
      case Some(root) =>
        import spark.implicits._
        val allowed = dict.descendantsOf(root).toSeq.sorted.toDF("envo")
        withAncestors.join(broadcast(allowed), Seq("envo"), "left_semi")
    }

    // --- proportional scoring: score = 1/|all_envos per conv| else 1.0,
    //     summed per (conv, envo) (analysis.py:376-380) ---
    val counts = restricted.groupBy("conv_id", "envo").agg(count(lit(1)).as("occ"))
    if (cfg.proportional) {
      // conv total as a window-sum over the ALREADY-AGGREGATED counts: one
      // exchange by conv_id instead of a second agg + two-sided join. Safe
      // from the window-skew trap because counts is bounded at ≤|EnvO| rows
      // per conversation (the raw-occurrence collapse happened above); the
      // total is a LONG sum of LONG counts — exact and order-invariant, so
      // every oracle's occ/total division is unchanged bit-for-bit.
      val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
      counts.select(col("conv_id"), col("envo"),
        (col("occ").cast("double") / sum("occ").over(w)).as("score"))
    } else {
      counts.select(col("conv_id"), col("envo"), col("occ").cast("double").as("score"))
    }
  }

  /** Fused flat scoring + evidence: ONE aggregation over envoRows computes
    * the occurrence count, the distinct supporting-turn count (A10), and
    * the bounded turn sample together, so the pipeline's annotated_with
    * branch needs neither a second full pass over the occurrence rows nor
    * the scores×support join-back (measured: that join was a SortMergeJoin
    * re-shuffling both sides at the bench corpus). Only valid when the
    * score transform neither adds keys (backtracking) nor removes them
    * (restrict) and scores every raw occurrence (flat) — then the fused
    * output is row-identical to score() joined with the evidence agg.
    *
    * output: (conv_id, envo:int, score:double, n_turns:long,
    * turn_sample:array<int>) */
  def scoreWithEvidence(spark: SparkSession, envoRows: DataFrame,
                        cfg: ScoreConfig, evidenceCap: Int): DataFrame = {
    require(supportsFused(cfg), s"fused scoring requires flat/no-backtracking/no-restrict, got $cfg")
    // Explicit two-level shape instead of countDistinct: mixing a distinct
    // agg with bounded_min_set makes Spark evaluate EVERY agg at the
    // distinct-key grain through non-codegen ObjectHashAggregate passes
    // plus an extra (conv, envo, turn) exchange (measured +60% pipeline
    // CPU). Level 1 collapses to distinct turns with a codegen'd count;
    // level 2 derives occ (sum), n_turns (count of distinct-turn rows) and
    // the bounded turn sample (distinct-min-k — identical on deduped
    // input). Under a conv_id-partitioned input BOTH levels plan
    // partition-local (every grouping key is conv_id-prefixed).
    val perTurn = envoRows
      .select(col("conv_id"), col("envo"), col("turn_idx"))
      .groupBy("conv_id", "envo", "turn_idx")
      .agg(count(lit(1)).as("occ_t"))
    val agg = perTurn
      .groupBy("conv_id", "envo")
      .agg(
        sum("occ_t").as("occ"),
        count(lit(1)).as("n_turns"),
        graft.functions.GraftFunctions.bounded_min_set(spark, col("turn_idx"), evidenceCap)
          .as("turn_sample"))
    val score =
      if (cfg.proportional) {
        // same bounded window-sum as score() — ≤|EnvO| rows per conv
        val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
        col("occ").cast("double") / sum("occ").over(w)
      } else col("occ").cast("double")
    agg.select(col("conv_id"), col("envo"), score.as("score"),
      col("n_turns"), col("turn_sample"))
  }

  /** Whether `scoreWithEvidence` computes the same rows as score() + the
    * evidence agg for this config. */
  def supportsFused(cfg: ScoreConfig): Boolean =
    cfg.normalization == "flat" && !cfg.backtracking && cfg.restrict.isEmpty

  /** The ancestor-closure dim as a tiny broadcastable DataFrame
    * (child:int, ancestor:int) — 9536 rows from envo_groups.tsv. */
  def closureFrame(spark: SparkSession, dict: EnvoDict): DataFrame = {
    import spark.implicits._
    dict.closure.toSeq
      .flatMap { case (c, as) => as.map(a => (c, a)) }
      .toDF("child", "ancestor")
  }
}
