package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's actual front door: a gzip-aware FASTA scan
 * (seqenv/fasta/__init__.py:26-48 — SeqIO.parse over a gzip.open handle).
 *
 * Spark-first: the text source splits records on '>' via lineSep and
 * decompresses `.gz` transparently through the Hadoop codec, so plain and
 * gzipped FASTA read identically with no custom InputFormat. Each record
 * row is then one header line + the wrapped sequence lines; a projection
 * splits those apart. Gzipped inputs are non-splittable (one task per
 * file) — at scale, FASTA arrives as many files, which is exactly the
 * parallelism unit here.
 *
 * Output: (seq_id, description, sequence, seq_length) — seq_length feeds
 * the P8 cutoff (generate.py:50-58) and `seq_id` is the conversation key
 * the rest of the engine joins on.
 */
object Fasta {

  def read(spark: SparkSession, path: String): DataFrame =
    // records are delimited by LINE-INITIAL '>' ("\n>"), matching
    // SeqIO.parse — a bare '>' lineSep would split mid-line on deflines
    // containing '>' (e.g. "5'->3'") and fabricate bogus records. The first
    // record keeps its leading '>' (no preceding newline); strip it.
    spark.read.option("lineSep", "\n>").text(path)
      .select(regexp_replace(col("value"), "^>", "").as("value"))
      .filter(length(trim(col("value"))) > 0)
      .select(
        // [^\n\r]: CRLF FASTA ends deflines "\r\n" and Spark's trim() strips
        // spaces only — an unanchored capture would keep the trailing \r
        regexp_extract(col("value"), "^(\\S+)", 1).as("seq_id"),
        trim(regexp_extract(col("value"), "^\\S*[ \\t]*([^\\n\\r]*)", 1)).as("description"),
        regexp_replace(regexp_replace(col("value"), "^[^\\n]*\\n?", ""), "\\s+", "")
          .as("sequence"))
      .filter(col("seq_id") =!= "")
      .withColumn("seq_length", length(col("sequence")))
}
