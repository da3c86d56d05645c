package graft.model

import java.sql.Timestamp

/** One transcript turn — the north-rule input row
  * (conv_id, turn_idx, role, text, tool, ts). Plays the role the reference
  * gives to a GI hit + its isolation-source text (seqenv/analysis.py:272-331):
  * conv_id ≈ sequence, turn ≈ GI hit, text ≈ isolation source, tool ≈ pubmed. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: Timestamp)

/** A detected dictionary mention inside a turn. */
final case class Mention(
    conv_id: String,
    turn_idx: Int,
    start: Int,
    end: Int,
    form: String,
    serials: Array[Long],
    envos: Array[Int])

/** Per-conversation concept-link score (the seq_to_counts analog,
  * seqenv/analysis.py:338-408). */
final case class ConceptScore(conv_id: String, envo: Int, score: Double)

/** A KG triple. subj is `conv_id` (annotated_with) or `conv_id:turn_idx`
  * (mentions); obj is a canonical ENVO CURIE. */
final case class Triple(
    subj: String,
    pred: String,
    obj: String,
    weight: Double,
    evidence: Long)
