package graft.tools

import graft.Sessions
import org.apache.spark.sql.functions._

/** Minimal repro: does a persisted repartition(k) frame keep its output
  * partitioning visible to consumers (self-join should plan with NO
  * exchange above the cache), and does a lazy localCheckpoint of the same
  * frame? Prints both physical plans. */
object CachePartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8, shufflePartitions = 16, appName = "cache-part-probe")
    import spark.implicits._
    val df = (0 until 100000).map(i => (s"k${i % 1000}", i)).toDF("k", "v")

    val cached = df.repartition(col("k")).persist()
    cached.count()
    val j1 = cached.groupBy("k").agg(sum("v").as("s1"))
      .join(cached.groupBy("k").agg(max("v").as("m1")), "k")
    println("=== cached ===")
    println(j1.queryExecution.executedPlan.toString)

    val ckpt = df.repartition(col("k")).localCheckpoint(eager = true)
    val j2 = ckpt.groupBy("k").agg(sum("v").as("s1"))
      .join(ckpt.groupBy("k").agg(max("v").as("m1")), "k")
    println("=== localCheckpoint ===")
    println(j2.queryExecution.executedPlan.toString)
    j2.count()
    spark.stop()
  }
}
