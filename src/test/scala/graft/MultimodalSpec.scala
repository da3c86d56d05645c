package graft

import org.apache.spark.sql.functions._
import graft.ops.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("synthetic media table is deterministic and typed") {
    val a = MultimodalOps.synthMedia(spark, 100).collect()
    val b = MultimodalOps.synthMedia(spark, 100).collect()
    assert(a.map(_.bytes.toSeq).toSeq === b.map(_.bytes.toSeq).toSeq)
    assert(a.map(_.kind).toSet === Set("image", "audio", "video"))
  }

  test("feature extraction: fixed dim, deterministic, batch-shaped") {
    val media = MultimodalOps.synthMedia(spark, 60)
    val f1 = MultimodalOps.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(spark, media.repartition(7)).collect().sortBy(_.media_id)
    assert(f1.length === 60)
    assert(f1.forall(_.feature.length === 16))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
  }

  test("exact payload dedup finds the planted duplicates") {
    val media = MultimodalOps.synthMedia(spark, 100)
    val groups = MultimodalOps.exactPayloadDedup(media.toDF()).collect()
    val dupGroup = groups.filter(_.getLong(2) > 1)
    // rows 17, 34, 51, 68, 85 share one planted payload
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getLong(2) === 5)
    assert(dupGroup.head.getLong(1) === 17) // keep-min id
  }

  test("feature near-dup pairs = exact-dup pairs under the stub decoder") {
    val media = MultimodalOps.synthMedia(spark, 100)
    val features = MultimodalOps.extractFeatures(spark, media)
    val pairs = MultimodalOps.featureNearDup(spark, features).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the stub folds `kind` into the feature, so only same-kind duplicate
    // payloads embed identically: 17/68 are video, 34/85 audio, 51 image
    assert(pairs === Set((17L, 68L), (34L, 85L)))
  }

  test("LSH feature near-dup matches the brute-force baseline (recall 1.0 here)") {
    val media = MultimodalOps.synthMedia(spark, 300)
    val features = MultimodalOps.extractFeatures(spark, media)
    val brute = MultimodalOps.featureNearDupBrute(spark, features).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = MultimodalOps.featureNearDup(spark, features).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "baseline must find the planted duplicate pairs")
    // LSH candidates are a subset of all pairs, verified with the exact
    // cosine — so lsh ⊆ brute always; at threshold 0.999 the surviving
    // pairs are identical-feature duplicates, which share every bucket,
    // so recall is exactly 1.0 (lsh == brute)
    assert(lsh === brute)
  }

  test("LSH feature near-dup on an empty feature set returns empty, not a crash") {
    import spark.implicits._
    val empty = MultimodalOps.extractFeatures(spark,
      MultimodalOps.synthMedia(spark, 10).filter(_ => false))
    val out = MultimodalOps.featureNearDup(spark, empty)
    assert(out.columns.toSeq === Seq("media_a", "media_b", "cosine"))
    assert(out.count() === 0L)
  }

  test("metadata validation rejects NULL metadata instead of passing it") {
    // null width/duration/rate made the reject predicates NULL, so when()
    // skipped every branch and metadata-missing rows sailed through
    val media = MultimodalOps.synthMedia(spark, 30).toDF()
      .withColumn("width",
        when(col("media_id") === 0, lit(null).cast("int")).otherwise(col("width")))        // image
      .withColumn("sample_rate",
        when(col("media_id") === 1, lit(null).cast("int")).otherwise(col("sample_rate")))  // audio
      .withColumn("duration_ms",
        when(col("media_id") === 2, lit(null).cast("int")).otherwise(col("duration_ms")))  // video
    val v = MultimodalOps.validateMedia(media)
      .select("media_id", "reject_reason").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(v(0L) === Some("missing_metadata"))
    assert(v(1L) === Some("missing_metadata"))
    assert(v(2L) === Some("missing_metadata"))
    assert(v(3L) === None) // intact metadata still valid
  }

  test("metadata validation: per-kind rules, reject reasons, stats add up") {
    val media = MultimodalOps.synthMedia(spark, 300).toDF()
      .withColumn("width",
        when(col("media_id") === 0, lit(0)).otherwise(col("width")))       // kind=image
      .withColumn("duration_ms",
        when(col("media_id") === 1, lit(-5)).otherwise(col("duration_ms"))) // kind=audio
      .withColumn("sample_rate",
        when(col("media_id") === 4, lit(12345)).otherwise(col("sample_rate"))) // kind=audio
    val v = MultimodalOps.validateMedia(media)
      .select("media_id", "kind", "reject_reason", "valid").collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(v(0L) === Some("bad_dims"))          // image with width 0
    assert(v(1L) === Some("bad_duration"))      // audio with duration -5
    assert(v(4L) === Some("bad_sample_rate"))   // audio off-whitelist rate
    assert(v(3L) === None)                      // untouched image stays valid
    // dimension rule must NOT apply to audio, duration rule NOT to image
    val audioWide = MultimodalOps.validateMedia(
      media.filter(col("kind") === "audio").withColumn("width", lit(0)))
      .filter(col("reject_reason") === "bad_dims").count()
    assert(audioWide === 0L)

    val stats = MultimodalOps.mediaValidationStats(media).collect()
    assert(stats.map(_.getString(0)).toSeq === Seq("audio", "image", "video"))
    stats.foreach { r =>
      val (n, valid, bd, bdur, brate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n === valid + bd + bdur + brate, s"counts must partition for ${r.getString(0)}")
    }
  }

  test("video frame sampling emits strided fixed-size windows") {
    val media = MultimodalOps.synthMedia(spark, 30)
    val frames = MultimodalOps.sampleFrames(spark, media, frameSize = 32, stride = 2)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.nonEmpty)
    val sizes = frames.select(length(col("frame_bytes"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(sizes === Set(32))
    // only video rows produce frames
    val videoIds = media.filter(_.kind == "video").collect().map(_.media_id).toSet
    assert(byId.keySet.subsetOf(videoIds))
  }
}
