package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * S6 — BLAST/VSEARCH outfmt-6 tabular scan (fixture-ingest utility; the
 * search stage itself is an external binary the engine does not port).
 * Column set pinned to the reference's outfmt spec
 * (seqenv/seqsearch/__init__.py:73): `qseqid sseqid pident length mismatch
 * gapopen qstart qend sstart send evalue bitscore qcovs staxids`.
 *
 * Includes the reference's search filters as relational predicates:
 *  - P2 pre-filters the reference pushes into the tool's arguments
 *    (e-value ≤ 1e-4, identity ≥ 97, seqenv/analysis.py:98-101);
 *  - P3 the coverage post-filter — a silent no-op in the reference
 *    (py2 str-vs-float compare, seqenv/seqsearch/blast.py:105-111), so it
 *    is implemented with the DOCUMENTED intent and gated off by default;
 *  - P4 GI extraction from `sseqid` (`gi|123456|ref|...`,
 *    seqenv/analysis.py:285-287).
 */
object Outfmt6 {

  val schema: StructType = StructType(Seq(
    StructField("qseqid", StringType),
    StructField("sseqid", StringType),
    StructField("pident", DoubleType),
    StructField("length", IntegerType),
    StructField("mismatch", IntegerType),
    StructField("gapopen", IntegerType),
    StructField("qstart", IntegerType),
    StructField("qend", IntegerType),
    StructField("sstart", IntegerType),
    StructField("send", IntegerType),
    StructField("evalue", DoubleType),
    StructField("bitscore", DoubleType),
    StructField("qcovs", DoubleType),
    StructField("staxids", StringType)))

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema)
      .option("sep", "\t").option("header", "false")
      .csv(path)

  /** P2 + (optionally) P3 applied as pushed-down predicates, then P4:
    * (qseqid, gi, hit_pos) — the reference's seq_to_gis rows (duplicate-
    * preserving, seqenv/analysis.py:272-294). `hit_pos` is a DETERMINIZED
    * STAND-IN for the reference's file order: BLAST emits hits sorted by
    * (evalue asc, bitscore desc) per query, so this ordering reproduces it
    * for tool-produced files, but a hand-reordered file would differ —
    * upui's keep-first could then pick a different (equally valid)
    * representative. Exact byte-order parity would need a line index from
    * the scan, which Spark's csv source does not expose per-file. */
  def hits(df: DataFrame,
           maxEvalue: Double = 1e-4,
           minIdentityPct: Double = 97.0,
           minCoverage: Option[Double] = None): DataFrame = {
    val filtered = df
      .filter(col("evalue") <= maxEvalue && col("pident") >= minIdentityPct)
    val covered = minCoverage match {
      case Some(c) => filtered.filter(col("qcovs") >= c * 100.0)
      case None => filtered // reference default: the coverage filter never fired
    }
    covered
      .withColumn("gi", split(col("sseqid"), "\\|").getItem(1).cast("long"))
      .withColumn("hit_pos",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qseqid").orderBy(col("evalue").asc, col("bitscore").desc, col("sseqid").asc)))
      .select("qseqid", "gi", "hit_pos", "pident", "evalue", "bitscore", "qcovs")
  }
}
