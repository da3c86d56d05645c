package graft.tools

import graft.{Bench, KgPipeline, PipelineConfig, Sessions}

/** Time-adjacent corpus A/B: alternate full pipeline runs over two turn
  * corpora at the SAME core count (A B A B ...), probe-bracketed. The
  * skew-stress criterion is "per-core throughput on the pathological
  * corpus within 15% of the uniform one" — an absolute-walls comparison
  * needs a clean host window, but the time-adjacent RATIO cancels a
  * uniform host phase exactly like the core-scaling pairs do, so this is
  * the steal-robust way to read it. Usage:
  *   CorpusAb <turnsA> <turnsB> [cores=8] [rounds=2]
  */
object CorpusAb {
  private def once(cores: Int, path: String): (Long, Double) = {
    val spark = Sessions.local(cores, shufflePartitions = 64, appName = s"ab-$cores")
    val turns = spark.read.parquet(path)
    new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false)).run(turns.limit(5000)).allTriples.count()
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    val nTriples = new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false)).run(turns).allTriples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (nTriples, sec)
  }

  def main(args: Array[String]): Unit = {
    val pathA = args(0)
    val pathB = args(1)
    val cores = if (args.length > 2) args(2).toInt else 8
    val rounds = if (args.length > 3) args(3).toInt else 2
    val probeTexts = Bench.defaultProbeTexts
    Bench.rawCpuProbe(8, probeTexts, minSec = 0.5) // JIT warmup
    val rs = (1 to rounds).map { i =>
      val pb = Bench.rawCpuProbe(8, probeTexts)
      val (ta, sa) = once(cores, pathA)
      val (tb, sb) = once(cores, pathB)
      val pa = Bench.rawCpuProbe(8, probeTexts)
      // per-triple throughput ratio B/A — the skew tax if B is the skewed
      // copy of A (triple counts differ slightly: folded conversations
      // merge their co-occurrence contributions)
      val ratio = (tb / sb) / (ta / sa)
      val agree = math.min(pb, pa) / math.max(pb, pa) >= 0.88
      println(f"AB $i: A=$sa%7.2f s (${ta / sa}%.0f tri/s)  B=$sb%7.2f s " +
        f"(${tb / sb}%.0f tri/s)  B/A=$ratio%5.3f  probes=$pb%.0f/$pa%.0f" +
        f"  [${if (agree) "adjacent" else "drifting"}]")
      (ratio, agree)
    }
    val usable = rs.filter(_._2).map(_._1)
    if (usable.nonEmpty)
      println(f"BEST B/A (probe-agreeing rounds): ${usable.max}%5.3f over ${usable.length} rounds")
    else println("BEST: no probe-agreeing round — rerun")
  }
}
