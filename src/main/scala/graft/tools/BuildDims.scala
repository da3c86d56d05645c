package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Sessions
import graft.stages.DimBuild

/**
 * Runnable dim/KB build — the `add_tagger_results.py` equivalent as one
 * job (reference runs it once to turn the raw NT dump into the gi +
 * isolation SQLite tables; here raw records in → parquet dims out, ready
 * for BioAdapter / GraftCli):
 *
 *   BuildDims --input <raw.parquet | raw.tsv> --out_dir DIR
 *     [--length_cutoff 4000] [--num_threads 8]
 *
 * Raw input columns: gi (long), source (string), pubmed (long, nullable),
 * optionally row_order (long — the reference's rowid; synthesized from
 * file order if absent) and seq_length (int — enables the P8 cutoff).
 * TSV inputs are headerless `gi \t source \t pubmed [\t seq_length]`.
 */
object BuildDims {

  private val tsvSchema = StructType(Seq(
    StructField("gi", LongType),
    StructField("source", StringType),
    StructField("pubmed", LongType),
    StructField("seq_length", IntegerType)))

  def main(args: Array[String]): Unit = {
    val a = args.sliding(2, 2)
      .collect { case Array(k, v) if k.startsWith("--") => k.drop(2) -> v }.toMap
    require(a.contains("input") && a.contains("out_dir"),
      "usage: BuildDims --input <raw.parquet|raw.tsv> --out_dir DIR " +
        "[--length_cutoff 4000] [--num_threads 8]")
    val spark = Sessions.local(a.getOrElse("num_threads", "8").toInt, appName = "graft-dimbuild")

    val raw0 = a("input") match {
      case p if p.endsWith(".tsv") =>
        spark.read.schema(tsvSchema).option("sep", "\t").csv(p)
      case p => spark.read.parquet(p)
    }
    // the reference's rowid ordering; for ingest without one, file order
    // stands in (monotonically_increasing_id is monotone within the scan)
    val raw = if (raw0.columns.contains("row_order")) raw0
      else raw0.withColumn("row_order", monotonically_increasing_id())

    val dims = DimBuild.build(spark, raw, a.getOrElse("length_cutoff", "4000").toInt)
    val out = a("out_dir")
    graft.sources.TableIO.write(dims.isolationDim, s"$out/isolation", sortBy = Seq("isokey"))
    graft.sources.TableIO.write(dims.giDim, s"$out/gi", sortBy = Seq("gi"))
    graft.sources.TableIO.write(dims.dataView, s"$out/data", sortBy = Seq("gi"))
    val (nIso, nGi) = (spark.read.parquet(s"$out/isolation").count(),
      spark.read.parquet(s"$out/gi").count())
    println(s"dims built: isolation=$nIso gi=$nGi -> $out")
    spark.stop()
  }
}
