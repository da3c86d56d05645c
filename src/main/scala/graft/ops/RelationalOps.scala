package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's relational operator inventory (SURVEY §2) exposed as
 * standalone queries over the driver testdata tables, each with a DuckDB
 * oracle (SparkEntry.oracleSql).
 *
 * Oracle-compare safety rules used throughout:
 *  - integer-valued aggregates (counts, sums of integral doubles) — exact;
 *  - money sums go through decimal(18,2) — exact in both engines;
 *  - double divisions always take bit-identical operands on both sides
 *    (IEEE division is then deterministic);
 *  - every query ORDER BYs its key columns for deterministic row sets.
 */
object RelationalOps {

  // deliberately NO Scans.fanOut here (r7, measured): these scans feed
  // cheap vectorized aggs/joins — the round-robin exchange costs more than
  // the single-task scan stage it parallelizes (a1 0.20->0.56s, j_star
  // 0.73->1.29s). The fan-out pays only where the scan-rooted stage does
  // heavy per-row work (tokenize/hash/decode: DocOps/EmbedOps/Multimodal).
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A1 flat counting — partial+final hash agg (seqenv/analysis.py:362-380). */
  def flatAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A2 ui normalization — dedupe-before-agg (seqenv/analysis.py:363-369). */
  def uiDedupeAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select("user_id", "event_type").distinct()
      .groupBy("user_id").agg(count(lit(1)).as("n_types"))
      .orderBy("user_id")

  /** A3 upui keep-first — row_number over a stable order
    * (seqenv/analysis.py:382-403, determinized by (ts, event_id)). */
  def upuiKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "value")
      .orderBy("user_id", "event_type")
  }

  /** A4 proportional scoring — per-group occurrence share
    * (seqenv/analysis.py:376-380). */
  def proportionalShare(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("occ"))
    val totals = counts.groupBy("user_id").agg(sum("occ").as("total"))
    counts.join(totals, "user_id")
      .select(col("user_id"), col("event_type"), col("occ"),
        (col("occ").cast("double") / col("total").cast("double")).as("share"))
      .orderBy("user_id", "event_type")
  }

  /** A6 top-N by abundance — TakeOrderedAndProject
    * (seqenv/analysis.py:200-225; tiebreak by key for determinism).
    * Accumulate in decimal(18,2) for exactness, emit double: DECIMAL
    * output widths differ between engines (Spark 28,2 vs DuckDB 38,2) and
    * the driver hashes the printed representation — double prints
    * identically on both sides. */
  def topNAbundance(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey").asc)
      .limit(10)

  /** P1 rename projection (seqenv/analysis.py:171-191): every key aliased
    * to "C%i" (0-based, the reference's enumerate order) over a stable sort
    * — distributed sort + zipWithIndex, no single-partition window. The
    * output IS the inverse map (key ↔ alias both present), matching the
    * reference's orig_names_to_renamed / renamed_to_orig dict pair. */
  def renameKeys(spark: SparkSession, keys: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StringType
    val ordered = keys.select(keyCol).distinct().orderBy(keyCol)
    val schema = ordered.schema.add("alias", StringType, nullable = false)
    spark.createDataFrame(
      ordered.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ s"C$i") },
      schema)
  }

  def renameProjection(spark: SparkSession, dir: String): DataFrame =
    renameKeys(spark, t(spark, dir, "documents"), "doc_id").orderBy("doc_id")

  /** P5/J5 semi join — customers having orders (EXISTS). */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** Anti join — customers with no orders (the reference's implicit
    * drop-absent-seqs, seqenv/analysis.py:370,385). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** A9 keep-min-rowid dedupe (add_tagger_results.py:145-147). */
  def keepMinDedupe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang", "source")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy("lang", "source")

  /** J6 abundance matmul — long-form join + agg replaces the reference's
    * pandas dot product (seqenv/outputs.py:67-86). */
  def matmulJoinAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(sum("l_quantity").as("total_qty"), count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority", "l_returnflag")

  /** J2 broadcast dim join — fact×dim with an explicit broadcast hint
    * (the reference's SQLite point-lookup, seqenv/analysis.py:355-357). */
  def broadcastDimJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum("l_quantity").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy("p_brand")

  /** P2/P3 predicate pushdown — filters reach the parquet scan. */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 30 && col("l_discount") <= 0.05)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum("l_quantity").as("sum_qty"))
      .orderBy("l_returnflag")

  /** A12 weight normalization — per-partition share via window
    * (seqenv/outputs.py:186-190; decimal window sum keeps it exact). */
  def windowNormalize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    t(spark, dir, "events")
      .withColumn("user_total", sum(col("value").cast("decimal(18,2)")).over(w))
      .select(col("event_id"), col("user_id"), col("value"),
        // zero-total partitions get NULL share, not an ANSI DIVIDE_BY_ZERO
        // crash (possible on real data where values cancel; mirrored CASE
        // in the oracle)
        when(col("user_total") =!= 0,
          col("value").cast("double") / col("user_total").cast("double")).as("share"))
      .orderBy("event_id")
  }

  /** Window ranking — top-2 orders per priority (A3 generalization). */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rk")
  }

  /** A7 distinct + set membership counts (seqenv/analysis.py:296-299,333-336). */
  def distinctCounts(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val inPart = li.join(t(spark, dir, "part"),
      col("l_partkey") === col("p_partkey"), "left_semi")
    li.select(countDistinct("l_partkey").as("n_distinct_parts"),
        countDistinct("l_suppkey").as("n_distinct_supps"))
      .crossJoin(inPart.select(countDistinct("l_partkey").as("n_parts_in_dim")))
  }

  /** HLL sketch distinct counts next to the exact ones — the constant-
    * memory cardinality path a 100 TB pipeline uses when exact
    * countDistinct's shuffle is too expensive. Error bound asserted in
    * OpsSpec; rows-only for the driver (sketches are engine-specific). */
  def approxDistinct(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("exact_parts"),
        approx_count_distinct("l_partkey", rsd).as("approx_parts"),
        countDistinct("l_orderkey").as("exact_orders"),
        approx_count_distinct("l_orderkey", rsd).as("approx_orders"))
      .orderBy("l_returnflag")

  /** Set operators: INTERSECT / EXCEPT over key sets (customers with
    * normal-priority orders vs urgent orders). */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val high = orders.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey"))
    val both = urgent.intersect(high).withColumn("set_op", lit("both"))
    val urgentOnly = urgent.except(high).withColumn("set_op", lit("urgent_only"))
    both.unionByName(urgentOnly).orderBy("set_op", "o_custkey")
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont`, both linear interpolation over sorted data). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("p75"))
      .orderBy("l_returnflag")

  /** Rollup aggregation — subtotal hierarchy over (returnflag, linestatus)
    * with the grand total (beyond the reference's inventory; the standard
    * reporting shape over the fact table). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Running per-user total — unbounded-preceding window frame (decimal
    * accumulation keeps the oracle exact; double output so the printed
    * representation matches the oracle's bit-wise). */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_total"))
      .orderBy("event_id")
  }

  /** Sessionization: gap-based session assignment over an event stream —
    * lag + cumulative-sum windows, then per-session aggregates. The
    * transcript-pipeline op for splitting long activity streams into
    * bounded work units. */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(run))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        (unix_timestamp(max("ts")) - unix_timestamp(min("ts"))).as("duration_secs"))
      .orderBy("user_id", "session_idx")
  }

  /** Multi-way star join: lineitem→orders→customer→nation→region with
    * small dims broadcast (the canonical 100 TB plan shape). */
  def starJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
}
