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
      // turn_idx is the one PRIMITIVE (non-nullable) Turn field: a
      // well-formed line missing it parses cleanly, so without this filter
      // it would pass quarantine and then kill the job at Dataset encoding
      // time ("Null value appeared in non-nullable field") — the exact
      // one-bad-line-kills-the-job failure this source exists to prevent
      .filter(col("_corrupt_record").isNull && col("conv_id").isNotNull &&
        col("turn_idx").isNotNull)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
  }

  /** The quarantine (for audit/repair — never silently dropped): malformed
    * lines AND well-formed rows missing the required conv_id — the latter
    * parse cleanly, so they carry no `_corrupt_record`, but `turns()` drops
    * them and they would otherwise vanish without a trace. (Selecting a
    * real column alongside the corrupt one is also required: Spark refuses
    * scans referencing ONLY the internal corrupt-record column.) */
  def corrupt(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .select(
        when(col("_corrupt_record").isNotNull, lit("malformed_json"))
          .when(col("conv_id").isNull, lit("missing_conv_id"))
          .when(col("turn_idx").isNull, lit("missing_turn_idx")).as("reason"),
        col("_corrupt_record"), col("conv_id"), col("text"))
      .filter(col("reason").isNotNull)
}
