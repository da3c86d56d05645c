package graft.tools

import graft.{KgPipeline, PipelineConfig, Sessions}

/** Time-adjacent (lowCores, highCores) scaling pairs for one sharing
  * strategy — the same pairing discipline as Bench.kgRun, minus the
  * headline suite, for fast strategy A/Bs under host-steal noise.
  * Usage: PairBench <turnsParquet> <strategy> [pairs] [lo] [hi] */
object PairBench {
  private def once(cores: Int, path: String, strategy: String): Double = {
    val spark = Sessions.local(cores, shufflePartitions = 64, appName = s"pair-$cores")
    val turns = spark.read.parquet(path)
    new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false, sharing = strategy)).run(turns.limit(5000)).allTriples.count()
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false, sharing = strategy)).run(turns).allTriples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    sec
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val strategy = args(1)
    val pairs = if (args.length > 2) args(2).toInt else 3
    val lo = if (args.length > 3) args(3).toInt else 4
    val hi = if (args.length > 4) args(4).toInt else 16
    val rs = (1 to pairs).map { i =>
      val sl = once(lo, path, strategy)
      val sh = once(hi, path, strategy)
      val eff = (sl / sh) / (hi.toDouble / lo)
      println(f"PAIR $strategy%-10s $i: lo=$sl%6.2f s  hi=$sh%6.2f s  eff=$eff%5.3f")
      (sl, sh, eff)
    }
    val best = rs.filter(_._3 <= 1.0).maxByOption(_._3)
    println(f"BEST $strategy%-10s ${best.map(b => f"lo=${b._1}%6.2f hi=${b._2}%6.2f eff=${b._3}%5.3f").getOrElse("none valid")}")
  }
}
