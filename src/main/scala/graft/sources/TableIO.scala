package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Thin table-format facade (SURVEY §7): the north rule targets Iceberg
 * tables, but no Iceberg runtime jar is resolvable in this offline sandbox,
 * so tables are parquet with Iceberg-identical logical schemas and layout
 * hints. Swapping `format` to "iceberg" (plus a catalog config) is the only
 * change needed when the runtime is available — callers never name a
 * format.
 *
 * Layout conventions:
 *  - partition columns become directory partitions (Iceberg: identity
 *    partition transforms);
 *  - `sortBy` is applied within partitions before write (Iceberg: table
 *    sort order), which gives min/max pruning on the sort keys in both
 *    formats.
 */
object TableIO {

  val format: String =
    sys.env.getOrElse("SPARK_GRAFT_TABLE_FORMAT", "parquet")

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil,
            sortBy: Seq[String] = Nil,
            mode: String = "overwrite"): Unit = {
    val sorted =
      if (sortBy.nonEmpty)
        df.sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
      else df
    val writer = sorted.write.mode(mode).format(format)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .save(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(format).load(path)
}
