package graft.tools

import graft.{Bench, KgPipeline, PipelineConfig, Sessions}

/** Time-adjacent (lowCores, highCores) scaling pairs for one sharing
  * strategy — the same pairing discipline as Bench.kgRun, minus the
  * headline suite, for fast strategy A/Bs under host-steal noise. Each
  * pair is BRACKETED by Bench's raw CPU probe (the same measurement the
  * official artifact's absolute floor is calibrated in: clean ≈ 2.8e6
  * texts/s at 8 threads on this host) and classified with Bench's rules:
  * agreeing brackets at/above the floor = clean; agreeing-but-low =
  * uniform_degraded (ratio trustworthy, walls inflated); disagreeing =
  * drifting. Usage: PairBench <turnsParquet> <strategy> [pairs] [lo] [hi] */
object PairBench {
  private def once(cores: Int, path: String, strategy: String): (Long, Double) = {
    val spark = Sessions.local(cores, shufflePartitions = 64, appName = s"pair-$cores")
    val turns = spark.read.parquet(path)
    new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false, sharing = strategy)).run(turns.limit(5000)).allTriples.count()
    spark.sharedState.cacheManager.clearCache()
    val t0 = System.nanoTime()
    val nTriples = new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false, sharing = strategy)).run(turns).allTriples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.stop()
    (nTriples, sec)
  }

  def main(args: Array[String]): Unit = {
    val path = args(0)
    val strategy = args(1)
    val pairs = if (args.length > 2) args(2).toInt else 3
    val lo = if (args.length > 3) args(3).toInt else 4
    val hi = if (args.length > 4) args(4).toInt else 16
    val floor = 0.65 * sys.env.get("SPARK_GRAFT_PROBE_CLEAN").map(_.toDouble)
      .getOrElse(2.8e6)
    val probeTexts = Bench.defaultProbeTexts
    Bench.rawCpuProbe(8, probeTexts, minSec = 0.5) // JIT warmup
    val rs = (1 to pairs).map { i =>
      val pb = Bench.rawCpuProbe(8, probeTexts)
      val (_, sl) = once(lo, path, strategy)
      val (tri, sh) = once(hi, path, strategy)
      val pa = Bench.rawCpuProbe(8, probeTexts)
      val eff = (sl / sh) / (hi.toDouble / lo)
      val cls =
        if (eff > 1.0) "invalid"
        else if (math.min(pb, pa) / math.max(pb, pa) < 0.88) "drifting"
        else if (math.min(pb, pa) < floor) "uniform_degraded"
        else "clean"
      println(f"PAIR $strategy%-10s $i: lo=$sl%7.2f s  hi=$sh%7.2f s  eff=$eff%5.3f" +
        f"  triples=$tri  probes=$pb%.0f/$pa%.0f  [$cls]")
      (sl, sh, eff, cls, tri)
    }
    val ranked = Seq("clean", "uniform_degraded", "drifting")
      .flatMap(c => rs.filter(_._4 == c).sortBy(-_._3).headOption)
    ranked.headOption match {
      case Some((sl, sh, eff, cls, tri)) =>
        println(f"BEST $strategy%-10s lo=$sl%7.2f hi=$sh%7.2f eff=$eff%5.3f " +
          f"triples=$tri tput_hi=${tri / sh}%.0f/s [$cls]")
      case None => println(s"BEST $strategy: none valid")
    }
  }
}
