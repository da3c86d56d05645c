package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dict.EnvoDict

/**
 * Stage 3 — canonicalization: collapse concept ids to primary ENVO CURIEs
 * and attach preferred display names (the reference's serial→CURIE→name
 * chain, seqenv/analysis.py:416-423,441-468, applied at
 * seqenv/outputs.py:60-65,144-145).
 *
 * Implemented as a broadcast-joined concept dim (≤1640 rows): fully
 * relational, codegen'd, no UDF.
 */
object Canonicalize {

  /** Concept dim: (envo:int, curie:string, name:string). Preferred-name
    * fallback is the CURIE itself (entities outnumber preferred names
    * 1640 vs 1179 in the reference dictionary). */
  def conceptFrame(spark: SparkSession, dict: EnvoDict): DataFrame = {
    import spark.implicits._
    dict.intToCurie.toSeq.sortBy(_._1)
      .map { case (i, curie) => (i, curie, dict.nameOf(curie)) }
      .toDF("envo", "curie", "name")
  }

  /** Attach (curie, name) to any frame carrying an `envo:int` column. */
  def canonicalize(spark: SparkSession, df: DataFrame, dict: EnvoDict): DataFrame =
    df.join(broadcast(conceptFrame(spark, dict)), "envo")
}
