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

    val ac = spark.sparkContext.broadcast(KgPipeline.sharedAutomaton)
    val tm = MentionDetect.detect(spark, turns, ac)
    time("mention_detect") { tm.count() }
    val tmP = tm.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("mention_persist") { tmP.count() }
    val te = MentionDetect.turnEnvos(tmP)
    val sc = LinkScore.score(spark, te, pipe.dict, ScoreConfig())
    time("link_score") { sc.count() }
    val scP = sc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("score_persist") { scP.count() }
    val mr = MentionDetect.explodeMentions(tmP)
    time("annotated") { TripleEmit.annotatedWith(spark, scP, mr, pipe.dict).count() }
    time("mention_triples") { TripleEmit.mentionTriples(spark, mr, pipe.dict).count() }
    time("cooccurrence") { TripleEmit.coOccurrence(scP).count() }
    spark.stop()
  }
}
