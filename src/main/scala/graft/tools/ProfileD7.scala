package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.ops.DocOps

/** Stage-by-stage timing of the d7 MinHash+LSH plan — run when d7's wall
  * time drifts, to see which stage moved. Stages mirror the production
  * operator's r7 structure (stop-agg → capped grams → KM bands → band join
  * → candidate-restricted verify where the DOC frame is semi-joined BEFORE
  * tokenization). Usage:
  *   sbt -batch "runMain graft.tools.ProfileD7 /root/testdata/sf0.1"
  */
object ProfileD7 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(32, shufflePartitions = 32, appName = "profile-d7")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[d7prof] $name%-28s rows=$n%-9d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    val toksDf = DocOps.curationFrameWide(spark, dir)
    val grams0 = DocOps.shinglesOf(toksDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stop = grams0.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > 50).select("g").persist()
    t("stop set (tokenize+agg)") { stop.count() }
    val grams = grams0.join(broadcast(stop), Seq("g"), "left_anti")
      .select("doc_id", "g")
    t("grams (tokenize+dfcap)") { grams.count() }
    val bands = DocOps.kmMinhashBands(grams, 12, rowsPerBand = 3)
    t("sig+bands (1 shuffle)") { bands.count() }
    val bandsP = bands.persist()
    val candidates = bandsP.toDF("doc_a", "bkey")
      .join(bandsP.toDF("doc_b", "bkey"), Seq("bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .persist()
    t("candidates (band join)") { candidates.count() }
    val candDocs = candidates.select(col("doc_a").as("doc_id"))
      .unionByName(candidates.select(col("doc_b").as("doc_id"))).distinct()
    t("candDocs") { candDocs.count() }
    val candGrams = DocOps.shinglesOf(
        toksDf.join(candDocs, Seq("doc_id"), "left_semi"))
      .join(broadcast(stop), Seq("g"), "left_anti")
      .select("doc_id", "g").persist()
    t("candGrams (cand-only tok)") { candGrams.count() }
    val sizes = candGrams.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = candGrams.toDF("doc_a", "g")
      .join(candGrams.toDF("doc_b", "g"), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
    t("inter (candGrams join)") { inter.count() }
    t("full verify") {
      candidates.join(inter, Seq("doc_a", "doc_b"), "left")
        .join(sizes.toDF("doc_a", "n_a"), "doc_a")
        .join(sizes.toDF("doc_b", "n_b"), "doc_b").count()
    }
    spark.stop()
  }
}
