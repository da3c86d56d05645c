package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.stages.IncrementalKg
import graft.synth.TranscriptGen

/** Incremental-equals-batch (the d18 discipline on the KG side): appending
  * conversation batches to the triple store yields exactly the triple set
  * of one whole-corpus run; re-delivery is a no-op; a config/dict change
  * against an existing index fails loudly. */
class IncrementalKgSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, Double, Long)] =
    df.select(col("subj"), col("pred"), col("obj"), col("weight"),
        col("evidence").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        math.rint(r.getDouble(3) * 1e9) / 1e9, r.getLong(4))).toSet

  test("two appends == one batch run; re-delivery skips; config lock throws") {
    val all = (0L until 80L).flatMap(i => TranscriptGen.turnsFor(i, 7L, 6, 10)).toDS.toDF
    val batchA = all.filter(expr("cast(substring(conv_id, 5, 8) as int) % 2 = 0"))
    val batchB = all.filter(expr("cast(substring(conv_id, 5, 8) as int) % 2 = 1"))
    val dir = Files.createTempDirectory("graft-inc-kg").toString

    val cfg = PipelineConfig(persistIntermediates = true)
    val sA = IncrementalKg.append(spark, dir, batchA, cfg)
    assert(sA.batch === 1 && sA.newConvs === 40L && sA.skippedConvs === 0L)
    val sB = IncrementalKg.append(spark, dir, batchB, cfg)
    assert(sB.batch === 2 && sB.newConvs === 40L && sB.skippedConvs === 0L)

    val full = new KgPipeline(spark, cfg).run(all)
    val expected = rows(full.allTriples)
    assert(rows(IncrementalKg.triples(spark, dir)) === expected,
      "incremental store must reproduce the whole-corpus allTriples exactly")
    full.unpersist()

    // idempotent re-delivery: batch A again adds nothing, store unchanged
    val sA2 = IncrementalKg.append(spark, dir, batchA, cfg)
    assert(sA2.newConvs === 0L && sA2.skippedConvs === 40L && sA2.newConvTriples === 0L)
    assert(rows(IncrementalKg.triples(spark, dir)) === expected)

    // a mixed batch ingests only the genuinely new conversations
    val extra = (80L until 90L).flatMap(i => TranscriptGen.turnsFor(i, 7L, 6, 10)).toDS.toDF
    val s3 = IncrementalKg.append(spark, dir, batchB.unionByName(extra), cfg)
    assert(s3.newConvs === 10L && s3.skippedConvs === 40L)
    val full2 = new KgPipeline(spark, cfg).run(all.unionByName(extra))
    assert(rows(IncrementalKg.triples(spark, dir)) === rows(full2.allTriples))
    full2.unpersist()

    // config lock: scoring knobs changed against the same index dir
    intercept[IllegalStateException] {
      IncrementalKg.append(spark, dir, extra,
        cfg.copy(score = stages.ScoreConfig(normalization = "ui")))
    }
  }
}
