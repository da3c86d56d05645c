package graft.tools

import graft.Sessions

/** Control corpus for the skew study: rewrite a turns corpus through the
  * SAME random repartition SkewCorpus uses, WITHOUT folding anything —
  * isolates the row-order effect (TranscriptGen writes a conversation's
  * turns adjacently; a plain repartition destroys that adjacency and with
  * it the hash-agg cache locality) from the actual one-hot-conversation
  * effect. Usage: ShufCorpus <inTurnsParquet> <outPath> */
object ShufCorpus {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(16, shufflePartitions = 64, appName = "graft-shuf")
    spark.read.parquet(args(0)).repartition(64)
      .write.mode("overwrite").parquet(args(1))
    println(s"wrote ${spark.read.parquet(args(1)).count()} turns to ${args(1)}")
    spark.stop()
  }
}
