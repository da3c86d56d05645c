package graft.tools

import graft.{Sessions, SparkEntry}

/** Time one SparkEntry query in isolation (best-of-N on a quiet machine —
  * Bench numbers are only meaningful when nothing else competes for the
  * VM's cores):
  *   QueryTime <query_name> [sfDir] [iters]
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTime <query_name> [sfDir] [iters]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, shufflePartitions = cpus, appName = "graft-qtime")
    spark.read.parquet(s"$sfDir/region.parquet").count() // session warmup
    val fn = SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      // fresh caches each run: otherwise op-internal persists from run 1
      // satisfy later runs and the timing measures cache reads, not the op
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qtime] $name run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
