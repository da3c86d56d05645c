package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism helpers shared by the operator families. */
private[graft] object Scans {

  /** Parallelism floor for unsplittable inputs (guide §2.5, "input skew:
    * one huge unsplittable file"): a single-file single-row-group parquet
    * table — this sandbox's testdata layout, or a gzip/raw landing file in
    * production — yields ONE scan partition, so every expensive projection
    * rooted on the scan (tokenize, shingle, hash, decode) runs serially no
    * matter how many cores the session has (r7: the d6/d7/d8/d21/m5 scan
    * stages were all single-task). When the scan's partition count is
    * below the session's default parallelism, fan the raw rows out
    * round-robin BEFORE the expensive stages: the serial part shrinks to
    * "read + write the raw bytes once" and everything downstream runs
    * wide. On a properly laid-out corpus (many files ≥ cores) the
    * condition is false and the plan is untouched — the floor is
    * derived from the session, never a local-mode constant. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
