package graft.stages

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The abundance-weighted projection stages of the reference
 * (seqenv/analysis.py:193-225, seqenv/outputs.py:53-124): wide TSV
 * OTU×sample matrices in, long-form relational processing inside, matrix
 * TSV/BIOM out. `conv_id` plays the OTU role in the transcript domain.
 *
 * All matrix math is long-form join + agg — the reference's pandas
 * `df1.dot(df2)` (outputs.py:67-86) becomes an equi-join + hash agg, which
 * scales to any matrix that fits a shuffle rather than a single node's RAM.
 */
object Abundance {

  /** S2 — wide TSV scan (first column = OTU id, remaining columns = sample
    * names) melted to long form (otu, sample, weight). Uses Spark 4's
    * native unpivot — no per-column UDF, full codegen. */
  def readWideTsv(spark: SparkSession, path: String): DataFrame = {
    val wide = spark.read
      .option("sep", "\t").option("header", "true").option("inferSchema", "true")
      .csv(path)
    melt(wide)
  }

  /** Wide → long: first column is the id, the rest are measure columns. */
  def melt(wide: DataFrame): DataFrame = {
    val idCol = wide.columns.head
    val samples = wide.columns.tail
    wide.unpivot(
      Array(col(idCol).as("otu")),
      samples.map(col),
      "sample", "weight")
      .withColumn("weight", col("weight").cast("double"))
  }

  /** A6 — top-N OTUs by total abundance (row-sum, desc, deterministic
    * tiebreak), clamped to the available count like the reference
    * (analysis.py:200-225). */
  def topN(abundance: DataFrame, n: Int): DataFrame =
    abundance.groupBy("otu")
      .agg(sum("weight").as("total"))
      .orderBy(col("total").desc, col("otu").asc)
      .limit(n)

  /** J5 — restrict an abundance/score table to the top-N OTU set. */
  def restrictToTopN(df: DataFrame, abundance: DataFrame, n: Int, key: String): DataFrame =
    df.join(broadcast(topN(abundance, n).select(col("otu").as(key))), key, "left_semi")

  /** J6 — the matmul: scores(conv_id, envo, score) · abundance(otu=conv_id,
    * sample, weight) → (envo, sample, value). */
  def projectToSamples(scores: DataFrame, abundance: DataFrame): DataFrame =
    scores
      .join(abundance.withColumnRenamed("otu", "conv_id"), "conv_id")
      .groupBy("envo", "sample")
      .agg(sum(col("score") * col("weight")).as("value"))

  /** A11 — long scores → wide concept×conv matrix with missing = 0
    * (outputs.py:53-65). Sink-side only: the pivot materializes one column
    * per conv, so callers must bound the conv set (the reference's own
    * matrix output has the same shape constraint). Pass `colValues` when
    * the column set is known: it pins the output schema (a column for
    * every expected conv even if unseen in the data) AND skips the extra
    * distinct-values job Spark otherwise runs to discover them. */
  def pivotMatrix(scores: DataFrame, rowKey: String = "envo",
                  colKey: String = "conv_id", value: String = "score",
                  colValues: Seq[String] = Nil): DataFrame = {
    val grouped = scores.groupBy(rowKey)
    val pivoted =
      if (colValues.nonEmpty) grouped.pivot(colKey, colValues)
      else grouped.pivot(colKey)
    pivoted.agg(first(value)).na.fill(0.0).orderBy(rowKey)
  }

  /** S7 — TSV matrix sink (single file, tab-separated, header). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(path)

  /** S9 — minimal BIOM 1.0 (JSON) sink for a long-form matrix
    * (outputs.py:151-170). Matrix sinks are inherently driver-small
    * (concepts × samples); guarded by maxCells. */
  def writeBiom(spark: SparkSession, long: DataFrame, path: String,
                rowKey: String = "envo", colKey: String = "sample",
                value: String = "value", maxCells: Long = 10000000L): Unit = {
    val rows = long.select(rowKey).distinct().orderBy(rowKey).collect().map(_.get(0).toString)
    val cols = long.select(colKey).distinct().orderBy(colKey).collect().map(_.get(0).toString)
    require(rows.length.toLong * cols.length <= maxCells,
      s"matrix ${rows.length}x${cols.length} exceeds BIOM sink bound")
    val rowIdx = rows.zipWithIndex.toMap
    val colIdx = cols.zipWithIndex.toMap
    val data = long.select(rowKey, colKey, value).collect().map { r =>
      s"[${rowIdx(r.get(0).toString)},${colIdx(r.get(1).toString)},${r.get(2)}]"
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"id":null,"format":"Biological Observation Matrix 1.0","type":"Table",
         |"matrix_type":"sparse","matrix_element_type":"float",
         |"shape":[${rows.length},${cols.length}],
         |"rows":[${rows.map(r => s"{${q("id")}:${q(r)},${q("metadata")}:null}").mkString(",")}],
         |"columns":[${cols.map(c => s"{${q("id")}:${q(c)},${q("metadata")}:null}").mkString(",")}],
         |"data":[${data.mkString(",")}]}""".stripMargin.replace("\n", "")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }
}
