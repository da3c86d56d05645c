package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Stage-by-stage timing of the d7 MinHash+LSH plan — run when d7's wall
  * time drifts, to see which stage moved. Usage:
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

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = filter(split(lower(col("text")), "\\W+"), x => x =!= lit(""))
    val shingles = array_distinct(
      expr("transform(sequence(1, greatest(size(toks) - 2, 0)), " +
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2)))"))
    val grams0 = docs.withColumn("toks", toks)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(shingles).as("g"))
    t("grams0 (tokenize)") { grams0.count() }
    val stop = grams0.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > 50).select("g").persist()
    t("stop agg") { stop.count() }
    val grams = grams0.join(broadcast(stop), Seq("g"), "left_anti").select("doc_id", "g")
    t("grams (anti-join)") { grams.count() }
    // the SHARED production hash expansion — drift-proof by construction
    val hashes = graft.ops.DocOps.kmMinhashHashes(grams, 12)
    t("hashes (1x md5 + KM)") { hashes.count() }
    val sig = hashes.groupBy("doc_id", "i").agg(min("h").as("mh"))
    t("sig (minhash)") { sig.count() }
    val bands = sig
      .withColumn("band", floor(col("i") / 3))
      .withColumn("slot", col("i") % 3)
      .groupBy("doc_id", "band")
      .agg(min(when(col("slot") === 0, col("mh"))).as("m0"),
        min(when(col("slot") === 1, col("mh"))).as("m1"),
        min(when(col("slot") === 2, col("mh"))).as("m2"))
      .select(col("doc_id"), concat_ws("|", col("band"), col("m0"), col("m1"), col("m2")).as("bkey"))
    val candidates = bands.toDF("doc_a", "bkey")
      .join(bands.toDF("doc_b", "bkey"), Seq("bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .persist()
    t("candidates (band join)") { candidates.count() }
    val candDocs = candidates.select(col("doc_a").as("doc_id"))
      .unionByName(candidates.select(col("doc_b").as("doc_id"))).distinct()
    t("candDocs") { candDocs.count() }
    val candGrams = grams.join(candDocs, Seq("doc_id"), "left_semi").persist()
    t("candGrams (semi, re-tok)") { candGrams.count() }
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
