package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Sessions

/** Derive a PATHOLOGICALLY SKEWED copy of a uniform turns corpus: a
  * deterministic ~`frac` slice of all turns (selected by conversation so
  * whole conversations fold) is rewritten into ONE giant conversation,
  * turn_idx renumbered to stay unique. This is the skew-stress input for
  * the scaling pairs — the uniform 1x-32x linearity series says nothing
  * about a production corpus where one conversation holds 1% of the
  * corpus (the conv_id-partitioned pipeline puts that conversation's
  * every agg/window row in one task).
  *
  * Generation tool only: the renumbering window is single-partition by
  * construction (it ranks exactly the folded slice, bounded by
  * frac x corpus) — acceptable for corpus synthesis, never an engine
  * pattern. Selection uses d12's md5-bucket construction under a 'skew:'
  * salt, so it is deterministic, RNG-free and independent of every other
  * bucket key in the engine.
  *
  * Usage: SkewCorpus <inTurnsParquet> <outPath> [frac=0.01]
  */
object SkewCorpus {
  val HotConvId = "convHOT_SKEW"

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val frac = if (args.length > 2) args(2).toDouble else 0.01
    require(frac > 0 && frac < 0.5, s"frac must be in (0, 0.5), got $frac")
    val spark = Sessions.local(16, shufflePartitions = 64, appName = "graft-skew")
    val turns = spark.read.parquet(in)
    val cut = (frac * (1L << 24)).toLong
    val bucket = expr(
      "cast(conv(substring(md5(concat('skew:', conv_id)), 1, 6), 16, 10) as bigint)")
    val hot = turns.filter(bucket < lit(cut))
    val cold = turns.filter(bucket >= lit(cut))
    val renumber = Window.orderBy(col("conv_id"), col("turn_idx"))
    val hotFolded = hot
      .withColumn("turn_idx", row_number().over(renumber) - 1)
      .withColumn("conv_id", lit(HotConvId))
      .select(turns.columns.map(col).toSeq: _*)
    cold.unionByName(hotFolded).repartition(64)
      .write.mode("overwrite").parquet(out)
    val written = spark.read.parquet(out)
    val total = written.count()
    val hotN = written.filter(col("conv_id") === HotConvId).count()
    println(f"SKEW total=$total hot=$hotN hot_frac=${hotN.toDouble / total}%.4f")
    spark.stop()
  }
}
