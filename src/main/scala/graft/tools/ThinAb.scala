package graft.tools

import graft.{KgPipeline, PipelineConfig, Sessions}

/** Time-adjacent A/B of the thin shared frame (mentionProvenance=false,
  * the default) vs the full provenance frame, at one core count — the
  * interleaving controls host drift the way PairBench's pairing does.
  * Usage: ThinAb <turnsParquet> [cores] [reps] */
object ThinAb {
  private def once(cores: Int, path: String, provenance: Boolean): Double = {
    val spark = Sessions.local(cores, shufflePartitions = 64, appName = s"thinab-$cores")
    val turns = spark.read.parquet(path)
    def cfg = PipelineConfig(persistIntermediates = true, dedupeTexts = false,
      mentionProvenance = provenance)
    new KgPipeline(spark, cfg).run(turns.limit(5000)).allTriples.count()
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    new KgPipeline(spark, cfg).run(turns).allTriples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    sec
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = if (args.length > 1) args(1).toInt else 16
    val reps = if (args.length > 2) args(2).toInt else 3
    val results = (1 to reps).map { i =>
      val thin = once(cores, path, provenance = false)
      val prov = once(cores, path, provenance = true)
      println(f"REP $i: thin=$thin%6.2f s  provenance=$prov%6.2f s  ratio=${prov / thin}%5.3f")
      (thin, prov)
    }
    println(f"BEST thin=${results.map(_._1).min}%6.2f s  provenance=${results.map(_._2).min}%6.2f s")
  }
}
