package graft.tools
import graft.ops.DocOps
import org.apache.spark.sql.functions._

/** A/B the d21 window-hash persist (the d7-grams lesson: caching a frame
  * that feeds a codegen-heavy branch can LOSE to recomputation). Measured
  * at sf0.1 / 32 cpus, warm best-of-2: persist=true 2.6-2.7 s vs
  * persist=false 3.5 s — here the frame is 3 scalar columns (no
  * columnar-boundary penalty) and the md5 pipeline is the expensive
  * upstream, so the persist stays (the default). */
object AbD21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(32, shufflePartitions = 32, appName = "ab-d21")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/documents.parquet").count()
    val injected = spark.read.parquet(s"$dir/documents.parquet").withColumn("text",
      when(col("doc_id") % 7 === 3, concat(col("text"), lit(" " + DocOps.repeatBanner)))
        .when(col("doc_id") % 23 === 0,
          concat(col("text"), lit(" " + DocOps.repeatBanner + " " + DocOps.repeatBanner)))
        .otherwise(col("text")))
    val toksCol = filter(split(lower(col("text")), "\\W+"), x => x =!= lit(""))
    for (p <- Seq(true, false, true, false)) {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = DocOps.repeatedSpansOf(injected.withColumn("toks", toksCol), persist = p).count()
      println(f"[ab] persist=$p rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
