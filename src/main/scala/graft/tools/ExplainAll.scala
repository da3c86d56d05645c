package graft.tools

import graft.{Sessions, SparkEntry}

/** Dump formatted physical plans for the operator queries — the
  * pushdown/broadcast/codegen review loop. Usage: ExplainAll [names...] */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(8, 8, "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        try println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: $e") }
        // per-query cache hygiene (QueryTime/Bench protocol): an earlier
        // query's op-internal persist otherwise rewrites later plans into
        // InMemoryRelation reads the production (cache-cleared) run never
        // sees — round 7 caught d6's shingle cache inside d7's "plan"
        finally spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
