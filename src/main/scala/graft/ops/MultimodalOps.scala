package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: images/audio/video as opaque `binary` columns
 * with typed metadata, processed in partition-batches.
 *
 * The decode step is a clearly-marked STUB (`StubDecoder`): this container
 * has no image/audio codecs, so decode produces a deterministic fake
 * feature vector derived from the bytes. Everything around it — the media
 * schema, batch iteration shape (the Scala analog of a Pandas-UDF
 * `mapInPandas` batch), partitioning, and the feature/dedup/similarity
 * plumbing downstream — is real and tested, so swapping `StubDecoder` for a
 * JNI/codec-backed implementation changes no plan shape.
 */
object MultimodalOps {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      bytes: Array[Byte],
      width: Int,            // images/video
      height: Int,
      sample_rate: Int,      // audio
      duration_ms: Int)      // audio/video

  final case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      feature: Array[Float]) // fixed-dim embedding

  /** The decode/feature boundary a real implementation would fill with a
    * codec + model. MUST be deterministic for a given payload. */
  trait MediaDecoder extends Serializable {
    def dim: Int
    def decodeAndEmbed(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** STUB decoder — deterministic fake, NOT a real decoder. Component d =
    * (md5("kind:payload:d") first 15 hex chars as int) % 31 − 15: small
    * INTEGER-valued floats, so every cosine downstream is exact integer
    * arithmetic until the final sqrt/divide (no float-vs-double rounding
    * to diverge an oracle), and the whole embedding is mirrorable in SQL
    * as `('0x' || substr(md5(...),1,15))::BIGINT % 31 - 15` — the same
    * 60-bit hash trick as the d8 simhash oracle. `kind` stays folded in:
    * equal payloads of different kinds embed differently, like a real
    * modality-specific model would. */
  final class StubDecoder(val dim: Int = 16) extends MediaDecoder {
    private val colon = ":".getBytes("UTF-8")
    def decodeAndEmbed(kind: String, bytes: Array[Byte]): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val kindBytes = kind.getBytes("UTF-8")
      Array.tabulate(dim) { d =>
        md.reset()
        md.update(kindBytes); md.update(colon)
        md.update(bytes); md.update(colon)
        md.update(String.valueOf(d).getBytes("UTF-8"))
        // top 60 bits of the digest without the hex round-trip: first 8
        // bytes big-endian, logically shifted — bit-identical to
        // parseLong(hexPrefix15, 16) (the simhash60 trick; the old per-byte
        // f"%02x" formatting dominated the decode profile)
        val h = java.nio.ByteBuffer.wrap(md.digest(), 0, 8).getLong >>> 4
        ((h % 31) - 15).toFloat
      }
    }
  }

  /** Deterministic synthetic media table (no external data): payload bytes
    * derived from a seeded hash chain; kinds round-robin. */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L,
                 partitions: Int = 8): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val rng = new scala.util.Random(seed ^ (i * 0x9E3779B97F4A7C15L))
      val kind = Seq("image", "audio", "video")(i.toInt % 3)
      val len = 64 + rng.nextInt(192)
      val bytes = new Array[Byte](len)
      rng.nextBytes(bytes)
      // duplicate payloads every 17th row (exact-dedup path)
      val dup = if (i % 17 == 0 && i > 0) {
        val r2 = new scala.util.Random(seed)
        val b2 = new Array[Byte](100); r2.nextBytes(b2); b2
      } else bytes
      MediaRow(i, kind, dup, 64 + rng.nextInt(512), 64 + rng.nextInt(512),
        8000 + 8000 * rng.nextInt(5), 1000 + rng.nextInt(60000))
    }
  }

  /** Feature extraction in partition batches — the mapInPandas analog:
    * one decoder instance per partition, rows streamed through it. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
                      decoder: MediaDecoder = new StubDecoder()): Dataset[MediaFeature] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeature(r.media_id, r.kind, r.bytes.length,
          decoder.decodeAndEmbed(r.kind, r.bytes))
      }
    }
  }

  /** Media table derived DETERMINISTICALLY from the documents corpus:
    * payload = the text's UTF-8 bytes, metadata = doc_id-keyed expressions.
    * Unlike `synthMedia` (Scala-Random bytes, not SQL-expressible) every
    * column here is mirrorable in a DuckDB oracle, which puts the
    * payload-dedup and validation gates under the driver's bit-exact hash
    * check. Same schema as MediaRow, pure projection over the scan. */
  def mediaFromDocs(spark: SparkSession, dir: String): DataFrame =
    Scans.fanOut(spark.read.parquet(s"$dir/documents.parquet"))
      .select(
        col("doc_id").as("media_id"),
        element_at(typedlit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("bytes"),
        (lit(64) + pmod(col("doc_id"), lit(512))).cast("int").as("width"),
        (lit(64) + pmod(col("doc_id") * 7, lit(512))).cast("int").as("height"),
        element_at(typedlit(Seq(8000, 16000, 44100, 48000)),
          (pmod(col("doc_id"), lit(4)) + 1).cast("int")).as("sample_rate"),
        (lit(1000) + pmod(col("doc_id"), lit(60000))).cast("int").as("duration_ms"))

  /** Exact payload dedup: md5 over the binary column (plan-identical to the
    * text exact-dedup — binary-safe hash, group, keep min id). */
  def exactPayloadDedup(media: DataFrame): DataFrame =
    media
      .groupBy(md5(col("bytes")).as("payload_hash"))
      .agg(min("media_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("payload_hash")

  // vector math comes from EmbedOps (dot / norm / cosineFromNorms) — one
  // implementation for media features and embeddings, so a numeric fix in
  // one can never silently miss the other

  /** Near-dup media by feature cosine — the SCALE path: candidates share an
    * LSH sign-bucket in ≥1 of nTables hash tables (the same EmbedOps
    * machinery as e5 — bucket equi-join, never all-pairs), then exact-cosine
    * verified. At threshold 0.999 (θ ≤ 2.6°) per-plane agreement is
    * 1 - θ/π ≈ 0.99, so 8 planes × 4 tables give per-pair miss probability
    * ≈ (1 - 0.99⁸)⁴ < 10⁻³ — and exact-duplicate payloads (identical
    * feature vectors, the dominant real case) share ALL buckets, recall 1.
    * MultimodalSpec asserts parity against the brute baseline;
    * PlanShapeSpec asserts the physical plan has no cartesian product. */
  def featureNearDup(spark: SparkSession, features: Dataset[MediaFeature],
                     threshold: Double = 0.999, nPlanes: Int = 8,
                     nTables: Int = 4): DataFrame = {
    val f = features.toDF().select(col("media_id"), col("feature"),
      EmbedOps.norm(col("feature")).as("fnorm"))
      // both the bucket projection and the two verify-side joins read the
      // feature frame — and its upstream (decode in mapPartitions) must not
      // re-run per reference
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // dimension probed from the PERSISTED frame (the take warms its cache
    // partition rather than running a separate decode job); an empty input
    // returns an empty result instead of head() throwing
    val firstRow = f.take(1)
    if (firstRow.isEmpty) {
      import spark.implicits._
      // release the cache handle before bailing — the caller never sees `f`,
      // so an orphaned empty cached frame would accumulate per call
      f.unpersist()
      return spark.emptyDataset[(Long, Long, Double)].toDF("media_a", "media_b", "cosine")
    }
    val dim = firstRow.head.getAs[scala.collection.Seq[Float]]("feature").length
    val buckets = EmbedOps.signBucketsFor(f, "media_id", "feature", dim, nPlanes, nTables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candIds = buckets.toDF("media_a", "bucket")
      .join(buckets.toDF("media_b", "bucket"), Seq("bucket"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b").distinct()
    candIds
      .join(f.toDF("media_a", "fa", "norm_a"), Seq("media_a"))
      .join(f.toDF("media_b", "fb", "norm_b"), Seq("media_b"))
      .withColumn("cosine",
        EmbedOps.cosineFromNorms(EmbedOps.dot(col("fa"), col("fb")), col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select("media_a", "media_b", "cosine")
      .orderBy("media_a", "media_b")
  }

  /** Brute-force feature near-dup — the quadratic CORRECTNESS BASELINE the
    * LSH path is tested against (MultimodalSpec); never the driver query. */
  private[graft] def featureNearDupBrute(spark: SparkSession, features: Dataset[MediaFeature],
                                         threshold: Double = 0.999): DataFrame = {
    val f = features.toDF().select(col("media_id"), col("feature"),
      EmbedOps.norm(col("feature")).as("fnorm"))
    val a = f.toDF("media_a", "fa", "norm_a")
    val b = f.toDF("media_b", "fb", "norm_b")
    a.crossJoin(b).filter(col("media_a") < col("media_b"))
      .withColumn("cosine",
        EmbedOps.cosineFromNorms(EmbedOps.dot(col("fa"), col("fb")), col("norm_a"), col("norm_b")))
      .filter(col("cosine") >= threshold)
      .select("media_a", "media_b", "cosine")
      .orderBy("media_a", "media_b")
  }

  /** m4 — metadata validation: the pre-decode sanity gate a media pipeline
    * runs BEFORE paying for codec work (invalid rows never reach the
    * decoder). Pure codegen'd projection — no UDF, no shuffle, fully
    * deterministic. Adds `reject_reason` (null = valid) and `valid`.
    * Rules are per-kind: dimension bounds apply to visual kinds only,
    * duration bounds to timed kinds, sample-rate whitelist to audio. */
  def validateMedia(media: DataFrame,
                    maxDim: Int = 16384,
                    maxDurationMs: Int = 6 * 3600 * 1000,
                    allowedRates: Seq[Int] =
                      Seq(8000, 16000, 24000, 32000, 40000, 44100, 48000)): DataFrame = {
    val visual = col("kind").isin("image", "video")
    val timed = col("kind").isin("audio", "video")
    // NULL metadata must REJECT, not pass: a null width makes `width < 1`
    // NULL, when() skips the branch, and the metadata-missing rows a
    // decoder would choke on sail through the gate — null-check first.
    val missingMeta =
      (visual && (col("width").isNull || col("height").isNull)) ||
        (timed && col("duration_ms").isNull) ||
        (col("kind") === "audio" && col("sample_rate").isNull)
    val badDims = visual && (col("width") < 1 || col("height") < 1 ||
      col("width") > maxDim || col("height") > maxDim)
    val badDuration = timed && (col("duration_ms") < 1 || col("duration_ms") > maxDurationMs)
    val badRate = (col("kind") === "audio") && !col("sample_rate").isin(allowedRates.map(Integer.valueOf): _*)
    media
      .withColumn("reject_reason",
        when(missingMeta, "missing_metadata")
          .when(badDims, "bad_dims")
          .when(badDuration, "bad_duration")
          .when(badRate, "bad_sample_rate")
          .otherwise(lit(null).cast("string")))
      .withColumn("valid", col("reject_reason").isNull)
  }

  /** Per-kind validation stats — the m4 query surface (two-level agg,
    * partial map-side combine; one shuffle on the 3-value kind key). */
  def mediaValidationStats(media: DataFrame): DataFrame =
    validateMedia(media)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("valid"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("reject_reason") === "bad_dims", 1L).otherwise(0L)).as("n_bad_dims"),
        sum(when(col("reject_reason") === "bad_duration", 1L).otherwise(0L)).as("n_bad_duration"),
        sum(when(col("reject_reason") === "bad_sample_rate", 1L).otherwise(0L)).as("n_bad_rate"),
        sum(when(col("reject_reason") === "missing_metadata", 1L).otherwise(0L)).as("n_missing_meta"),
        min(when(col("valid"), col("duration_ms"))).as("min_valid_duration_ms"),
        max(when(col("valid"), col("duration_ms"))).as("max_valid_duration_ms"),
        max("width").as("max_width"),
        max("height").as("max_height"))
      .orderBy("kind")

  /** Video frame sampling stub: emits every `stride`-th fixed-size byte
    * window as a "frame" payload (real impl: codec keyframe extraction).
    * The exploded (media_id, frame_idx, frame_bytes) shape is the real
    * contract downstream stages consume. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
                   frameSize: Int = 32, stride: Int = 2): DataFrame = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val nFrames = math.max(0, (r.bytes.length - frameSize) / frameSize + 1)
      (0 until nFrames by stride).map { f =>
        (r.media_id, f, r.bytes.slice(f * frameSize, f * frameSize + frameSize))
      }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
