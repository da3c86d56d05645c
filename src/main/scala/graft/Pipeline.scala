package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dict.{AhoCorasick, EnvoDict}
import graft.stages._

/** End-to-end KG-construction pipeline configuration. */
final case class PipelineConfig(
    score: ScoreConfig = ScoreConfig(),
    checkpointDir: Option[String] = None,
    evidenceCap: Int = 20,
    /** Persist the mention/score stages (MEMORY_AND_DISK) — set when more
      * than one output sink will be materialized, so the tagger and scorer
      * run once instead of once per sink. */
    persistIntermediates: Boolean = false,
    /** Physical strategy for mention detection: true = tag DISTINCT texts
      * then hash-join back (wins on duplicated corpora); false = tag every
      * turn in place with zero shuffles (wins on mostly-unique corpora). */
    dedupeTexts: Boolean = true,
    /** Share the envo-row projection across triple branches via a
      * deterministic exchange (repartition by conv_id) instead of a
      * columnar cache: Spark's ReuseExchange computes the shuffle once and
      * all branches read it. Shuffle write scales with cores; the columnar
      * cache build does not. Overrides persistIntermediates for envoRows.
      * Measured crossover (3.4M turns, allTriples action): 8 cores
      * exchange 18.5-19.5 s vs cache 20.3-21.2 s; 2 cores exchange
      * 74-80 s vs cache 70-73 s — prefer the exchange on real multi-core
      * executors, the cache at low parallelism
      * (`tools.ProfileKg <turns> <cores> direct e2e` reproduces the A/B). */
    reuseExchange: Boolean = false)

/** All pipeline outputs (lazy DataFrames — nothing executes until a sink
  * action, exactly like the reference's pulled property-DAG,
  * seqenv/analysis.py:148-159 via seqenv/common/cache.py). */
final case class KgResult(
    turnMentions: DataFrame,   // (conv_id, turn_idx, tool, text_hash, mentions)
    mentionRows: DataFrame,    // flattened per-mention rows
    scores: DataFrame,         // (conv_id, envo, score)
    annotated: DataFrame,      // annotated_with triples + evidence
    mentionTriples: DataFrame, // mentions triples
    coOccurrence: DataFrame,   // (envo_a, envo_b, n_convs)
    coOccurrenceTriples: DataFrame, // cooccurs_with triples (canonicalized)
    ontologyTriples: DataFrame) {

  /** Every dynamic triple family in one (subj, pred, obj, weight, evidence)
    * frame — the canonical KG sink (one action materializes everything). */
  def allTriples: DataFrame = {
    val cols = Seq("subj", "pred", "obj", "weight", "evidence").map(org.apache.spark.sql.functions.col)
    annotated.select(cols: _*)
      .unionByName(mentionTriples.select(cols: _*))
      .unionByName(coOccurrenceTriples.select(cols: _*))
  }
}

/**
 * The transcript→EnvO KG builder. One dictionary + automaton per pipeline
 * instance, broadcast once per SparkSession.
 *
 * Dataflow: turns → MentionDetect (distinct-text tagger) → LinkScore
 * (flat/ui/upui × proportional × backtracking × restrict) → Canonicalize →
 * TripleEmit (+ co-occurrence edges), each stage optionally checkpointed
 * with a lineage manifest for resume.
 */
final class KgPipeline(spark: SparkSession, cfg: PipelineConfig = PipelineConfig(),
                       dictOverride: Option[EnvoDict] = None) {

  /** The dictionary every stage uses. Default: the bundled EnvO artifact
    * (one shared instance per JVM). An override threads a caller-supplied
    * vocabulary through the WHOLE composed run — tagger (as a broadcast
    * automaton via the injected-dict tag expression), scorer closure,
    * canonicalization dim — so the full `run()` wiring is testable and
    * driveable under a restricted or domain dictionary. */
  val dict: EnvoDict = dictOverride.getOrElse(KgPipeline.sharedDict)

  /** Broadcast automaton for the override path; the default path keeps the
    * JVM-global automaton (zero broadcast, built per executor from bundled
    * resources). Lazy: built only if run() is called. Cached per
    * (SparkContext, dict content) — a long-lived session constructing one
    * pipeline per request would otherwise leak one broadcast (and one
    * tag_envo_b<id> registry entry) per run; with the cache both are
    * bounded by the number of DISTINCT dictionaries seen. */
  private lazy val dictBc: Option[org.apache.spark.broadcast.Broadcast[AhoCorasick]] =
    dictOverride.map(d => KgPipeline.broadcastFor(spark, d))

  /** md5 of the analyzed input lineage + every config knob that changes
    * stage output — recorded in checkpoint manifests so resuming a dir
    * against a different input/config fails loudly (Checkpoint.stage).
    * Lineage-based (no scan of the input): file sources carry their paths
    * in the plan; in-memory LocalRelations hide their rows from the plan
    * string, so their row data is hashed explicitly. */
  private def fingerprint(turns: DataFrame): Option[String] =
    cfg.checkpointDir.map { _ =>
      val planKey = turns.queryExecution.analyzed.canonicalized.collect {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
          s"LocalRelation(${lr.schema.catalogString},rows=${lr.data.hashCode})"
        // simpleString for file relations is just "Relation[cols] parquet" —
        // NO path — so two same-schema inputs would fingerprint identically
        // and stale resume would be served silently. Root paths restore the
        // input identity (still lineage-only, no data scan).
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          val loc = lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case other => other.toString
          }
          s"Relation(${lr.schema.catalogString},$loc)"
        case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
          s"DSv2(${v2.schema.catalogString},${v2.name})"
        case node => node.simpleString(200)
      }.mkString("\n")
      // dict identity: an overridden vocabulary changes every stage's
      // output, so resuming a checkpoint written under a different
      // dictionary must fail loudly like any other config change. Full
      // CONTENT digest, not the form key set — same forms with a different
      // form→concept mapping are a different dictionary.
      val dictKey = dictOverride
        .map(d => s"dict:${d.contentDigest}")
        .getOrElse("dict:shared")
      val key = s"$planKey|${cfg.score}|${cfg.evidenceCap}|${cfg.dedupeTexts}|$dictKey"
      java.util.UUID.nameUUIDFromBytes(key.getBytes("UTF-8")).toString
    }

  def run(turns: DataFrame): KgResult = {
    val ckpt = cfg.checkpointDir
    val fp = fingerprint(turns)

    val turnMentions0 = Checkpoint.stage(spark, ckpt, "mentions", fp) {
      MentionDetect.detect(spark, turns, cfg.dedupeTexts, dictBc)
    }
    // the hot intermediate is the FLAT envo-occurrence projection — all
    // primitive columns, so the columnar cache build stays cheap (caching
    // the nested mentions array is ~10x slower)
    val envoRows0 = MentionDetect.envoRows(turnMentions0)
    val envoRows =
      if (cfg.reuseExchange)
        envoRows0.repartition(org.apache.spark.sql.functions.col("conv_id"))
      else if (cfg.persistIntermediates)
        envoRows0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else envoRows0
    val mentionRows = MentionDetect.explodeMentions(turnMentions0)

    val scores0 = Checkpoint.stage(spark, ckpt, "scores", fp) {
      LinkScore.score(spark, envoRows, dict, cfg.score)
    }
    val scores =
      if (cfg.persistIntermediates)
        scores0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else scores0

    val annotated = Checkpoint.stage(spark, ckpt, "annotated", fp) {
      TripleEmit.annotatedWith(spark, scores, envoRows, dict, cfg.evidenceCap)
    }
    val mentionTriples = TripleEmit.mentionTriples(spark, envoRows, dict)
    val cooc = Checkpoint.stage(spark, ckpt, "cooccurrence", fp) {
      // scores is a (conv_id, envo) groupBy output — provably distinct
      TripleEmit.coOccurrence(scores, assumeDistinct = true)
    }

    KgResult(
      turnMentions = turnMentions0,
      mentionRows = mentionRows,
      scores = scores,
      annotated = annotated,
      mentionTriples = mentionTriples,
      coOccurrence = cooc,
      coOccurrenceTriples = TripleEmit.coOccurrenceTriples(spark, cooc, dict),
      ontologyTriples = TripleEmit.ontologyTriples(spark, dict))
  }
}

object KgPipeline {
  // Dictionary + automaton are immutable; build them once per JVM.
  lazy val sharedDict: EnvoDict = EnvoDict.load()
  lazy val sharedAutomaton: AhoCorasick = AhoCorasick.build(sharedDict)

  // (SparkContext identity, dict content digest) -> broadcast automaton.
  // Entries for a stopped context are dropped on next access.
  private val bcCache =
    scala.collection.mutable.Map.empty[(org.apache.spark.SparkContext, String),
      org.apache.spark.broadcast.Broadcast[AhoCorasick]]

  private[graft] def broadcastFor(spark: SparkSession, dict: EnvoDict):
      org.apache.spark.broadcast.Broadcast[AhoCorasick] = bcCache.synchronized {
    bcCache.keysIterator.filter(_._1.isStopped).toList.foreach(bcCache.remove)
    bcCache.getOrElseUpdate((spark.sparkContext, dict.contentDigest),
      spark.sparkContext.broadcast(AhoCorasick.build(dict)))
  }
}
