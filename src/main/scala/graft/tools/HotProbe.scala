package graft.tools

import org.apache.spark.sql.functions._

import graft.{KgPipeline, PipelineConfig, Sessions}

/** Isolate the mega-conversation cost: run the fused pipeline over (a) the
  * folded 1%-hot conversation alone and (b) the SAME turns under their
  * original conv_ids — identical text volume, so any wall/CPU delta is
  * conversation-cardinality cost, not data volume.
  * Usage: HotProbe <skewPath> <uniformPath> [cores=8] */
object HotProbe {
  def main(args: Array[String]): Unit = {
    val skewPath = args(0)
    val uniPath = args(1)
    val cores = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.local(cores, shufflePartitions = 64, appName = "hot-probe")
    val cut = (0.01 * (1L << 24)).toLong
    val bucket = expr(
      "cast(conv(substring(md5(concat('skew:', conv_id)), 1, 6), 16, 10) as bigint)")
    val hot = spark.read.parquet(skewPath)
      .filter(col("conv_id") === SkewCorpus.HotConvId)
    val orig = spark.read.parquet(uniPath).filter(bucket < lit(cut))
    def timed(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val n = df.count()
      val t0 = System.nanoTime()
      val tri = new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
        dedupeTexts = false)).run(df).allTriples.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      println(f"HOT $name%-10s turns=$n triples=$tri sec=$sec%8.2f")
    }
    // warmup
    new KgPipeline(spark, PipelineConfig(persistIntermediates = true,
      dedupeTexts = false)).run(hot.limit(5000)).allTriples.count()
    spark.sharedState.cacheManager.clearCache()
    timed("orig", orig)
    timed("folded", hot)
    timed("orig2", orig)
    timed("folded2", hot)
    spark.stop()
  }
}
