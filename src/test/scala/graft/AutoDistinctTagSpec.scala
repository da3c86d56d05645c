package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
import org.apache.spark.sql.functions._
import graft.functions.{AutoDistinctTag, GraftFunctions}

/** The AutoDistinctTag optimizer rule: plan shape + result equivalence. */
class AutoDistinctTagSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the ocean was calm", "the ocean was calm", "the ocean was calm",
    "marine wetland", "no concepts at all", null)

  // repartition keeps the plan out of ConvertToLocalRelation's reach
  // (which would eagerly evaluate a Project over a LocalRelation before
  // user-provided optimizer rules run)
  private def query() = texts.toDF("text").repartition(2)
    .select(col("text"), GraftFunctions.tag_envo(col("text")).as("m"))
    .select(col("text"), expr("transform(m, x -> x.form)").as("forms"))

  private def collected() = query().collect()
    .map(r => (r.getString(0), Option(r.getSeq[String](1)).map(_.toList)))
    .sortBy(t => (t._1 == null, String.valueOf(t._1)))
    .toList

  test("rule rewrites the plan to dedupe-join and preserves results") {
    val baseline = collected()
    spark.conf.set(AutoDistinctTag.ConfKey, "true")
    try {
      val q = query()
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collect { case j: Join => j }.nonEmpty, s"expected a join:\n$opt")
      assert(opt.collect { case a: Aggregate => a }.nonEmpty, s"expected an aggregate:\n$opt")
      assert(collected() === baseline)
    } finally spark.conf.set(AutoDistinctTag.ConfKey, "false")
  }

  test("rule is a no-op when disabled") {
    val opt = query().queryExecution.optimizedPlan
    assert(opt.collect { case j: Join => j }.isEmpty)
  }

  test("stacked projections: a tag call above a rewritten one is also rewritten") {
    spark.conf.set(AutoDistinctTag.ConfKey, "true")
    try {
      // two tag_envo projections at different depths over different columns
      val df = Seq(("the ocean was calm", "marine wetland"), ("lake", "lake"))
        .toDF("t1", "t2").repartition(2)
        .select(col("t2"), GraftFunctions.tag_envo(col("t1")).as("m1"))
        .select(col("m1"), GraftFunctions.tag_envo(col("t2")).as("m2"))
      val opt = df.queryExecution.optimizedPlan
      val joins = opt.collect { case j: Join => j }
      assert(joins.length >= 2, s"both tag projections should be rewritten:\n$opt")
      val rows = df.selectExpr("size(m1) s1", "size(m2) s2").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
      assert(rows === Seq((1, 1), (1, 2))) // lake/lake and ocean/marine+wetland
    } finally spark.conf.set(AutoDistinctTag.ConfKey, "false")
  }

  test("multiplicity preserved: 3 duplicate rows stay 3 rows") {
    spark.conf.set(AutoDistinctTag.ConfKey, "true")
    try {
      val n = query().filter(col("text") === "the ocean was calm").count()
      assert(n === 3)
    } finally spark.conf.set(AutoDistinctTag.ConfKey, "false")
  }
}
