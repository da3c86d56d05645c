package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.Turn

/**
 * JSONL transcript scan — the wire format agent/conversation transcripts
 * usually ship in: one JSON object per line with the driver-contract turn
 * columns (conv_id, turn_idx, role, text, tool, ts ISO-8601).
 *
 * Scale decisions:
 *  - explicit schema, never inference: at 100 TB an inference pass reads
 *    the corpus twice (and samples can miss late-appearing fields);
 *  - PERMISSIVE mode with a `_corrupt_record` column: a handful of
 *    malformed lines in a trillion-turn crawl must not kill the job, and
 *    must not vanish silently either — `corrupt()` exposes them for audit
 *    (the no-silent-drops rule);
 *  - gzip transparency comes free from the text-based source.
 */
object JsonlTranscripts {

  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType),
    StructField("_corrupt_record", StringType)))

  /** Raw scan: every line becomes a row; malformed lines carry the
    * original text in `_corrupt_record` and nulls elsewhere. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
      .json(path)

  /** Valid rows as the engine's typed turns. */
  def turns(spark: SparkSession, path: String): Dataset[Turn] = {
    import spark.implicits._
    read(spark, path)
      .filter(col("_corrupt_record").isNull && col("conv_id").isNotNull)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
  }

  /** The quarantined malformed lines (for audit/repair — never silently
    * dropped). Keeps `conv_id` (null for corrupt rows) alongside the raw
    * line: Spark refuses scans whose referenced columns are ONLY the
    * internal corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
    * CORRUPT_RECORD_COLUMN). */
  def corrupt(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .select(col("_corrupt_record"), col("conv_id"))
      .filter(col("_corrupt_record").isNotNull)
}
