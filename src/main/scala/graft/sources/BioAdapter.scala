package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The literal seqenv-replacement path: run the reference's own analysis
 * over BLAST/VSEARCH output + the GI isolation-source database, through
 * this engine's transcript pipeline unchanged.
 *
 * Domain mapping (SURVEY §1): sequence ≈ conversation, GI hit ≈ turn,
 * isolation-source text ≈ turn text, pubmed id ≈ tool. The reference's
 * SQLite `gi(id, isokey, pubmed)` + `isolation(id, source, envos)` tables
 * (seqenv/analysis.py:306-322) become two parquet dims; its per-GI point
 * lookups (analysis.py:355-357) become the two joins below; everything
 * downstream — flat/ui/upui, proportional, backtracking, restrict,
 * matrices, triples — is the shared engine.
 *
 * A seqenv user's inputs map as:
 *   blastout (outfmt 6)  -> Outfmt6.read + Outfmt6.hits  (P2 filters)
 *   gi_db.sqlite3        -> giDim(gi, isokey, pubmed) + isolationDim(isokey, source)
 *   abundances.tsv       -> stages.Abundance.readWideTsv
 */
object BioAdapter {

  private val epoch = new Timestamp(0L)

  /** hits(qseqid, gi, hit_pos) × giDim(gi, isokey, pubmed:nullable) ×
    * isolationDim(isokey, source) -> transcript-shaped turns.
    * GIs absent from giDim drop out (the reference's `gi in db` predicate,
    * analysis.py:333-336); hit order becomes turn order, so upui's
    * keep-first matches the reference's dict-insertion-order "first".
    *
    * No broadcast hints: the real NT-derived GI dim is multi-GB (hundreds
    * of millions of GIs), so forcing a broadcast would OOM the driver at
    * exactly the scale this module exists for — AQE broadcasts either dim
    * when its measured size is actually small (as in fixtures/tests). */
  def turnsFromHits(spark: SparkSession, hits: DataFrame,
                    giDim: DataFrame, isolationDim: DataFrame): DataFrame =
    hits
      .join(giDim, "gi")
      .join(isolationDim, "isokey")
      .select(
        col("qseqid").as("conv_id"),
        col("hit_pos").cast("int").as("turn_idx"),
        lit("hit").as("role"),
        col("source").as("text"),
        col("pubmed").cast("string").as("tool"),
        lit(epoch).as("ts"))
}
