package graft.streaming

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dict.AhoCorasick
import graft.model.Turn

/** One streaming mention occurrence (a turn×concept row with event time). */
final case class StreamMention(
    conv_id: String,
    turn_idx: Int,
    ts: java.sql.Timestamp,
    envo: Int)

/** Running per-conversation concept count emitted by the stateful scorer. */
final case class ConvConceptCount(conv_id: String, envo: Int, occurrences: Long)

/**
 * Structured Streaming surface of the engine: the batch tagger applied to a
 * live transcript stream (readStream → transform → writeStream).
 *
 * The reference is strictly batch (SURVEY §2.9) — this is the capability a
 * production transcript pipeline adds on top: tagging at ingest, windowed
 * concept counts with watermarked late-data handling, and incremental
 * per-conversation link scores via mapGroupsWithState.
 *
 * Note on the distinct-text rewrite: within a micro-batch the tagger still
 * runs per-row (cross-batch dedup would need unbounded state); the batched
 * automaton is compute-cheap enough that streaming favors simplicity.
 */
object StreamingMentions {

  /** turns stream → mention occurrence stream (one row per turn×concept). */
  def mentionStream(spark: SparkSession, turns: Dataset[Turn],
                    ac: Broadcast[AhoCorasick]): Dataset[StreamMention] = {
    import spark.implicits._
    turns.mapPartitions { iter =>
      val automaton = ac.value
      iter.flatMap { t =>
        automaton.tag(t.text).iterator.flatMap(_.envos.iterator)
          .map(e => StreamMention(t.conv_id, t.turn_idx, t.ts, e))
      }
    }
  }

  /** Watermarked tumbling-window concept counts — the streaming analog of
    * the flat counting agg (A1), tolerating `lateness` of event-time skew. */
  def windowedConceptCounts(mentions: Dataset[StreamMention],
                            windowLen: String = "1 hour",
                            lateness: String = "10 minutes"): DataFrame =
    mentions.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("envo"))
      .agg(count(lit(1)).as("occurrences"))

  /** Streaming exact dedup at ingest — the streaming twin of the batch
    * exact-dedup operator (d1): drop rows whose content hash was already
    * seen. `dropDuplicatesWithinWatermark` bounds the hash state by event
    * time (a hash ages out once the watermark passes it), so state stays
    * constant at 10^12-turn scale where a plain `dropDuplicates` would
    * grow without bound. Keeps the first arrival per hash. */
  def dedupStream(turns: DataFrame, lateness: String = "10 minutes"): DataFrame =
    turns
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Curated streaming ingest — the training-pipeline curation projections
    * applied AT the stream boundary, in one readStream pipeline: watermark-
    * bounded exact dedup, then the quality gate (the SAME codegen'd
    * expression as the batch operator, `DocOps.qualityExpr` — Structured
    * Streaming runs projections unchanged), then tagging. Emits the mention
    * stream of the surviving turns. */
  def curatedIngest(spark: SparkSession, turns: Dataset[Turn],
                    ac: Broadcast[AhoCorasick],
                    minQuality: Double = 0.3,
                    lateness: String = "10 minutes"): Dataset[StreamMention] = {
    import spark.implicits._
    val gated = dedupStream(turns.toDF(), lateness)
      .filter(graft.ops.DocOps.qualityExpr(col("text")) >= minQuality)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
    mentionStream(spark, gated, ac)
  }

  /** Incremental per-conversation concept counts: KeyValueGroupedDataset +
    * flatMapGroupsWithState. State = concept→count map per conv_id, with a
    * processing-time timeout so finished conversations age out (bounded
    * state at 10^12-turn scale). Emits the updated rows each batch. */
  def runningConvScores(spark: SparkSession, mentions: Dataset[StreamMention],
                        stateTimeout: Option[String] = Some("1 hour")): Dataset[ConvConceptCount] = {
    import spark.implicits._
    val timeoutConf = stateTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    mentions
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[Map[Int, Long], ConvConceptCount](
        OutputMode.Update(), timeoutConf) {
        (conv: String, rows: Iterator[StreamMention], state: GroupState[Map[Int, Long]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val current = state.getOption.getOrElse(Map.empty[Int, Long])
            val updates = rows.foldLeft(Map.empty[Int, Long]) { (m, r) =>
              m.updated(r.envo, m.getOrElse(r.envo, 0L) + 1L)
            }
            val merged = updates.foldLeft(current) { case (m, (e, n)) =>
              m.updated(e, m.getOrElse(e, 0L) + n)
            }
            state.update(merged)
            stateTimeout.foreach(state.setTimeoutDuration)
            updates.keysIterator.map(e => ConvConceptCount(conv, e, merged(e)))
          }
      }
  }
}
