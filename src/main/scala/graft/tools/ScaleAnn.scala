package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions
import graft.ops.EmbedOps

/** e8 at a production-shaped nlist (r6 verdict #7): generate a clustered
  * synthetic embedding table (deterministic splitmix noise around
  * `nCenters` centers — BuildDims-style, no external data), run the
  * UNCHANGED EmbedOps.ivfSqTopK at the given nlist/nprobe vs the e7 flat
  * SQ scan, and report wall + recall@5 against the exact brute top-k.
  *
  *   ScaleAnn [n] [dim] [nlist] [nprobe] [nQueries] [threads]
  *   defaults: 1000000 64 4096 64 10 32
  */
object ScaleAnn {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def unit(h: Long): Float =
    ((h >>> 11) * (2.0 / (1L << 53)) - 1.0).toFloat

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toLong).getOrElse(1000000L)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val nlist = args.lift(2).map(_.toInt).getOrElse(4096)
    val nprobe = args.lift(3).map(_.toInt).getOrElse(64)
    val nQueries = args.lift(4).map(_.toInt).getOrElse(10)
    val threads = args.lift(5).map(_.toInt).getOrElse(32)
    val spark = Sessions.local(threads, shufflePartitions = threads, appName = "graft-scaleann")
    import spark.implicits._

    // clustered corpus: 0.8 * center(id % nCenters) + 0.2 * noise(id) —
    // IVF recall is only meaningful when the data HAS coarse structure
    // (SemDeDup's regime); ids < nlist span distinct centers so the
    // deterministic seed sample sees them all
    val nCenters = nlist
    val dir = java.nio.file.Files.createTempDirectory("graft-scaleann").toString
    spark.range(0L, n, 1L, threads * 2).map { i =>
      val c = i % nCenters
      val comps = Array.tabulate(dim) { d =>
        0.8f * unit(mix64(c * 1000003L + d)) + 0.2f * unit(mix64(i * 131L + d))
      }
      (i, comps)
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println(s"[scaleann] corpus written: n=$n dim=$dim -> $dir")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[scaleann] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      a
    }
    def topMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("query_id", "rank", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq).toMap

    // exact brute top-5 for the recall reference (nQueries x n scan)
    val exact = timed("exact brute top-5") {
      topMap(EmbedOps.cosineTopK(spark, dir, k = 5, nQueries = nQueries))
    }
    spark.sharedState.cacheManager.clearCache()
    val flat = timed(s"e7 flat SQ scan") {
      topMap(EmbedOps.sqTopK(spark, dir, k = 5, nQueries = nQueries))
    }
    spark.sharedState.cacheManager.clearCache()
    val ivf = timed(s"e8 IVFxSQ nlist=$nlist nprobe=$nprobe") {
      topMap(EmbedOps.ivfSqTopK(spark, dir, k = 5, nQueries = nQueries,
        nlist = nlist, nprobe = nprobe))
    }
    def recall(got: Map[Long, Seq[Long]]): Double =
      exact.keys.toSeq.map { q =>
        got.getOrElse(q, Nil).toSet.intersect(exact(q).toSet).size / 5.0
      }.sum / exact.size
    println(f"[scaleann] recall@5: e7=${recall(flat)}%.2f e8=${recall(ivf)}%.2f " +
      f"(scan fraction ~ ${nprobe.toDouble / nlist}%.4f of the corpus per query)")
    spark.stop()
  }
}
