package graft.stages

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.dict.{AhoCorasick, MentionSpan}

/**
 * Stage 1 — dictionary mention detection over per-turn text.
 *
 * The Spark-first recast of the reference's tagger stage
 * (seqenv/data_sources/add_tagger_results.py:114-134): the single biggest
 * physical lever is its *dedupe-before-expensive-op* pattern — tag only
 * DISTINCT texts, then join results back to the turns that carry them.
 * Transcript corpora repeat text heavily (tool banners, templates), so at
 * 10^12 turns this cuts automaton work by the duplication factor while the
 * join-back stays a plain shuffled equi-join on a 64-bit text hash that AQE
 * can downgrade to broadcast when the distinct set is small.
 *
 * The automaton itself is broadcast once (≈6.5k patterns) and applied inside
 * a typed mapPartitions — compute-bound, embarrassingly parallel, no skew
 * (texts are hash-distributed regardless of conversation size).
 */
object MentionDetect {

  /** turns(conv_id, turn_idx, role, text, tool, ts)
    *   -> (conv_id, turn_idx, tool, text_hash, mentions: array<struct>)
    * Only turns with ≥1 mention survive (inner join + non-empty filter),
    * matching the reference's "GIs with envo" restriction
    * (seqenv/analysis.py:333-336). */
  def detect(spark: SparkSession, turns: DataFrame, ac: Broadcast[AhoCorasick]): DataFrame = {
    import spark.implicits._

    val withHash = turns.withColumn("text_hash", xxhash64(col("text")))

    // Tag each DISTINCT text exactly once.
    val tagged: DataFrame = withHash
      .select(col("text_hash"), col("text"))
      .dropDuplicates("text_hash")
      .as[(Long, String)]
      .mapPartitions { iter =>
        val automaton = ac.value
        iter.flatMap { case (h, t) =>
          val spans = automaton.tag(t)
          if (spans.isEmpty) None else Some((h, spans))
        }
      }
      .toDF("text_hash", "mentions")

    withHash
      .join(tagged, "text_hash")
      .select(
        col("conv_id"), col("turn_idx"), col("tool"),
        col("text_hash"), col("mentions"))
  }

  /** Flatten to one row per mention (for the `mentions` triple sink and
    * evidence tables). */
  def explodeMentions(turnMentions: DataFrame): DataFrame =
    turnMentions
      .select(col("conv_id"), col("turn_idx"),
        posexplode(col("mentions")).as(Seq("mention_pos", "m")))
      .select(col("conv_id"), col("turn_idx"), col("mention_pos"),
        col("m.start").as("start"), col("m.end").as("end"),
        col("m.form").as("form"), col("m.serials").as("serials"),
        col("m.envos").as("envos"))

  /** Per-turn flattened envo occurrence list, preserving span order —
    * the analog of one GI's decoded envo tuple (seqenv/analysis.py:357). */
  def turnEnvos(turnMentions: DataFrame): DataFrame =
    turnMentions.withColumn("envos", flatten(col("mentions.envos")))
      .select("conv_id", "turn_idx", "tool", "text_hash", "envos")
}
