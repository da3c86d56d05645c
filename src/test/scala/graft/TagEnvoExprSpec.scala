package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** The native tag_envo Catalyst expression: Column API, SQL registration,
  * null safety, and agreement with the automaton. */
class TagEnvoExprSpec extends SparkSpec {
  import spark.implicits._

  test("tag_envo via Column API matches the automaton") {
    val df = Seq("the ocean was calm", "no concepts", "marine wetland")
      .toDF("text")
      .select(col("text"), GraftFunctions.tag_envo(col("text")).as("m"))
    val rows = df.select(col("text"), expr("transform(m, x -> x.form)").as("forms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(rows("the ocean was calm") === Seq("ocean"))
    assert(rows("no concepts").isEmpty)
    assert(rows("marine wetland") === Seq("marine", "wetland"))
  }

  test("tag_envo callable from SQL after registration") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT tag_envo('bacterioplankton sample from lake') AS m")
      .select(expr("m[0].envos[0]"), expr("m[0].start"), expr("m[0].end"))
      .collect().head
    assert(out.getInt(0) === 20)
    assert((out.getInt(1), out.getInt(2)) === (29, 33))
  }

  test("null text yields null, empty text yields empty array") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT tag_envo(CAST(NULL AS STRING)) AS a, tag_envo('') AS b").collect().head
    assert(r.isNullAt(0))
    assert(r.getSeq[Any](1).isEmpty)
  }

  test("multi-concept span carries both serials and envos") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT tag_envo('marine') AS m")
      .select(expr("m[0].serials"), expr("m[0].envos")).collect().head
    assert(r.getSeq[Long](0).length === 2)
    assert(r.getSeq[Int](1) === Seq(447, 569))
  }
}
