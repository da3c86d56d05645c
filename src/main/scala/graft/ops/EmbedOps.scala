package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (vec_id, embedding:
 * array<float>, label).
 *
 * Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
 * variant is the scale path (candidates only within matching hyperplane
 * sign-buckets — at 100 TB the brute-force cross join is quadratic and
 * infeasible, the LSH join shuffles on the bucket key only).
 *
 * All math uses built-in higher-order functions (zip_with + aggregate):
 * codegen'd, no UDF, left-to-right fold order so the DuckDB oracle (same
 * fold order, same double casts) is bit-identical.
 */
object EmbedOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** dot(a, b) in double, left-to-right accumulation. */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k for a set of query vectors (default: the
    * first `nQueries` vec_ids). Output: (query_id, rank, neighbor_id,
    * cosine rounded to 6). */
  def cosineTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 3): DataFrame = {
    val e = emb(spark, dir)
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = queries
      .crossJoin(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** All near-duplicate embedding pairs with cosine ≥ threshold —
    * embedding-based near-dup dedup. Brute force (correctness baseline). */
  def cosineNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.38): DataFrame = {
    val e = emb(spark, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (norm(col("va")) * norm(col("vb"))))
      .filter(col("cosine") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** IVF (inverted-file) approximate NN — the other scale path: assign
    * every vector to its nearest of `nlist` coarse centroids (one broadcast
    * pass, no shuffle of the big side), then search a query only inside its
    * `nprobe` nearest cells. Centroids here are a deterministic sample
    * (vec_id < nlist) — production would k-means them; the plan shape
    * (broadcast assign → cell-key equi-join → windowed top-k) is identical
    * and is what matters at 100 TB. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 3,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = emb(spark, dir)
    val centroids = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("cell"), col("embedding").as("cv"))

    // nearest cell per vector: broadcast centroids, argmax via max_by
    val assigned = e
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("embedding"), col("cv")) /
        (norm(col("embedding")) * norm(col("cv"))))
      .groupBy("vec_id")
      .agg(expr("max_by(cell, ccos)").as("cell"),
        first("embedding").as("embedding"))

    // nprobe nearest cells per query vector
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("ccos").desc, col("cell").asc)
    val queryCells = e.filter(col("vec_id") < nQueries)
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", dot(col("embedding"), col("cv")) /
        (norm(col("embedding")) * norm(col("cv"))))
      .withColumn("rk", row_number().over(wCell))
      .filter(col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))

    val cands = queryCells
      .join(assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "nv").distinct()
      .withColumn("cosine", dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate NN (scale path, verified in tests against the
    * brute-force baseline): `nPlanes` deterministic pseudo-random
    * hyperplanes (seeded per (plane, dim) — no RNG state, reproducible on
    * any cluster) give a sign-bucket key; candidate pairs share a bucket;
    * top-k among candidates. Recall is tunable via nTables × nPlanes. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 3,
              nPlanes: Int = 4, nTables: Int = 8): DataFrame = {
    val e = emb(spark, dir)

    // deterministic hyperplane component for (table, plane, dim):
    // a hash-derived value in [-1, 1) — computed inside Catalyst, no driver
    // state, so the same buckets arise on every executor / cluster size.
    def planeComponent(table: Int, plane: Int): Column =
      expr(s"transform(sequence(0, size(embedding) - 1), " +
        s"d -> cast(pmod(xxhash64(concat('$table:$plane:', d)), 2000001) as double) / 1000000.5 - 1.0)")

    def bucketKey(table: Int): Column = {
      val signs = (0 until nPlanes).map { p =>
        when(dot(col("embedding"), planeComponent(table, p)) >= 0, lit(1)).otherwise(lit(0))
          .cast("string")
      }
      concat(lit(s"t$table:") +: signs: _*)
    }

    val buckets = e.select(
      col("vec_id"), col("embedding"),
      explode(array((0 until nTables).map(bucketKey): _*)).as("bucket"))

    val queries = buckets.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket"))
    val cands = queries
      .join(buckets.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"), col("bucket")), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "nv").distinct()
      .withColumn("cosine", dot(col("qv"), col("nv")) / (norm(col("qv")) * norm(col("nv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
      .orderBy("query_id", "rank")
  }
}
