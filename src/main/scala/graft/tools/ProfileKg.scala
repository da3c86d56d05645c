package graft.tools

import graft.{KgPipeline, PipelineConfig, Sessions}
import graft.stages._
import graft.synth.TranscriptGen

/** Per-stage wall-clock profile of the KG pipeline at a given core count.
  * Usage: ProfileKg <turnsParquet> <cores> */
object ProfileKg {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val cores = args(1).toInt
    val dedupe = args.length < 3 || args(2) != "direct"
    val spark = Sessions.local(cores, shufflePartitions = cores, appName = s"profile-$cores")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val turns = spark.read.parquet(path)
    time("read+count") { turns.count() }
    val pipe = new KgPipeline(spark)
    // warmup
    new KgPipeline(spark).run(turns.limit(2000)).annotated.count()

    // e2e mode: the bench's exact flagship shape (direct tagging, one
    // allTriples action), A/B-ing the envoRows sharing strategy —
    // columnar cache (persistIntermediates) vs deterministic exchange
    // reuse (reuseExchange). Two timed reps each, cache cleared between.
    if (args.contains("e2e")) {
      for (reuse <- Seq(false, true); rep <- 1 to 2) {
        time(f"e2e reuse=$reuse rep$rep") {
          val r = new KgPipeline(spark, PipelineConfig(
            persistIntermediates = true, dedupeTexts = false,
            reuseExchange = reuse)).run(turns)
          val n = r.allTriples.count()
          spark.sharedState.cacheManager.clearCache()
          n
        }
      }
      spark.stop()
      return
    }

    val tm = MentionDetect.detect(spark, turns, dedupe)
    time("mention_detect") { tm.count() }
    val er = MentionDetect.envoRows(tm)
    time("envo_rows") { er.count() }
    val usePq = args.contains("pq")
    val erP = if (usePq) {
      var out: org.apache.spark.sql.DataFrame = null
      time("envo_rows_parquet") {
        er.write.mode("overwrite").parquet("/dev/shm/graft-profile-er")
        out = spark.read.parquet("/dev/shm/graft-profile-er")
        out.count()
      }
      out
    } else {
      val p = er.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("envo_rows_persist") { p.count() }
      p
    }
    val sc = LinkScore.score(spark, erP, pipe.dict, ScoreConfig())
    time("link_score") { sc.count() }
    val scP = sc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("score_persist") { scP.count() }
    time("annotated") { TripleEmit.annotatedWith(spark, scP, erP, pipe.dict).count() }
    time("mention_triples") { TripleEmit.mentionTriples(spark, erP, pipe.dict).count() }
    time("cooccurrence") { TripleEmit.coOccurrence(scP, assumeDistinct = true).count() }
    spark.stop()
  }
}
