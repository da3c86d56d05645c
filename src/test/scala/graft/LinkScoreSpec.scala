package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.model.Turn
import graft.stages.{LinkScore, MentionDetect, ScoreConfig}

/** FIXTURES.md §4 scoring fixtures, mirroring documentation/frequencies.png
  * and seqenv/analysis.py:338-408.
  * Texts: {"lake mud of the lake", same again (dup), "marine wetland"}.
  * Tagger output per text: lake-mud text -> [20, 1000001, 20]; marine
  * wetland -> [447, 569, 43]. */
class LinkScoreSpec extends SparkSpec {
  import spark.implicits._

  private def turn(conv: String, idx: Int, text: String, tool: Option[String]) =
    Turn(conv, idx, "user", text, tool, new Timestamp(1735689600000L + idx * 1000L))

  private val miniTurns = Seq(
    turn("c1", 0, "lake mud of the lake", Some("search")),
    turn("c1", 1, "lake mud of the lake", Some("search")),
    turn("c1", 2, "marine wetland", Some("search")))

  private def scores(turns: Seq[Turn], cfg: ScoreConfig): Map[(String, Int), Double] = {
    val pipeline = new KgPipeline(spark)
    val tm = MentionDetect.detect(spark, turns.toDS.toDF)
    LinkScore.score(spark, MentionDetect.envoRows(tm), pipeline.dict, cfg)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
  }

  test("flat, non-proportional: duplicates double-count") {
    val s = scores(miniTurns, ScoreConfig("flat", proportional = false))
    assert(s(("c1", 20)) === 4.0)       // lake ×2 per text ×2 duplicate texts
    assert(s(("c1", 1000001)) === 2.0)  // mud ×1 per text ×2
    assert(s(("c1", 43)) === 1.0)       // wetland
    assert(s(("c1", 447)) === 1.0 && s(("c1", 569)) === 1.0) // marine both concepts
  }

  test("ui: duplicate texts within a conversation counted once") {
    val s = scores(miniTurns, ScoreConfig("ui", proportional = false))
    assert(s(("c1", 20)) === 2.0)
    assert(s(("c1", 1000001)) === 1.0)
    assert(s(("c1", 43)) === 1.0)
  }

  test("upui: text-dedupe then tool-dedupe keep-first; null tools all kept") {
    // equal tool: after text-dedupe (turns 0,2 survive), tool-dedupe keeps
    // only the first turn -> marine-wetland row dropped
    val s1 = scores(miniTurns, ScoreConfig("upui", proportional = false))
    assert(s1(("c1", 20)) === 2.0)
    assert(s1(("c1", 1000001)) === 1.0)
    assert(!s1.contains(("c1", 43)))
    // null tools: every distinct-text row kept
    val nullTool = miniTurns.map(_.copy(tool = None))
    val s2 = scores(nullTool, ScoreConfig("upui", proportional = false))
    assert(s2(("c1", 20)) === 2.0 && s2(("c1", 43)) === 1.0)
    // distinct tools: both rows survive
    val twoTools = Seq(
      miniTurns(0), miniTurns(1), miniTurns(2).copy(tool = Some("browser")))
    val s3 = scores(twoTools, ScoreConfig("upui", proportional = false))
    assert(s3(("c1", 43)) === 1.0)
  }

  test("proportional: per-conversation scores sum to 1.0") {
    for (norm <- Seq("flat", "ui", "upui")) {
      val s = scores(miniTurns, ScoreConfig(norm, proportional = true))
      val total = s.collect { case ((c, _), v) if c == "c1" => v }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"$norm sums to $total")
    }
    // flat proportional: 9 occurrences total (marine contributes TWO
    // concepts): lake = 4/9, mud = 2/9, others 1/9
    val s = scores(miniTurns, ScoreConfig("flat", proportional = true))
    assert(math.abs(s(("c1", 20)) - 4.0 / 9) < 1e-9)
    assert(math.abs(s(("c1", 1000001)) - 2.0 / 9) < 1e-9)
  }

  test("backtracking: ancestors receive propagated counts") {
    val turns = Seq(turn("c1", 0, "the ocean was calm", None))
    val s = scores(turns, ScoreConfig("flat", proportional = false, backtracking = true))
    assert(s(("c1", 15)) === 1.0)        // ocean itself
    assert(s(("c1", 63)) === 1.0)        // water body, an ancestor
    val dict = KgPipeline.sharedDict
    // every ancestor in the closure got exactly one count
    dict.closure(15).foreach(a => assert(s(("c1", a)) === 1.0))
  }

  test("restrict: keeps only strict descendants of the restrict term") {
    val turns = Seq(
      turn("c1", 0, "the ocean was calm", None),
      turn("c1", 1, "marine sediment", None)) // ENVO:00002113
    // restrict to water body (63): ocean kept, marine sediment dropped
    val s = scores(turns, ScoreConfig("flat", proportional = false, restrict = Some(63)))
    assert(s.contains(("c1", 15)))
    assert(!s.contains(("c1", 2113)))
    assert(!s.contains(("c1", 63))) // the restrict node itself is dropped
  }

  test("combined: ui + backtracking + restrict + proportional apply in reference order") {
    // reference order (analysis.py:362-380): dedupe -> backtrack -> restrict
    // -> proportional over the RESTRICTED occurrence count
    val dict = KgPipeline.sharedDict
    val turns = Seq(
      turn("c1", 0, "the ocean was calm", None),
      turn("c1", 1, "the ocean was calm", None), // ui-deduped duplicate
      turn("c1", 2, "marine sediment", None))    // 2113, outside water body
    val s = scores(turns, ScoreConfig("ui", proportional = true,
      backtracking = true, restrict = Some(63))) // restrict: water body subtree
    // after dedupe: occurrences {ocean 15, marine-sediment 2113}
    // backtracking adds all ancestors of both; restrict keeps only strict
    // descendants of 63: ocean itself + its ancestors below 63
    def descendsFromWaterBody(e: Int) =
      dict.closure.getOrElse(e, Array.empty[Int]).contains(63)
    // occurrence multiset after backtracking: each child (15, 2113) once,
    // plus one occurrence of each of its ancestors; then restrict
    val children = Seq(15, 2113)
    val occurrences = children.flatMap(c => c +: dict.closure(c).toSeq)
      .filter(descendsFromWaterBody)
    val expected = occurrences.groupBy(identity).view.mapValues(_.size).toMap
    assert(s.keySet.map(_._2) === expected.keySet)
    val total = s.values.sum
    assert(math.abs(total - 1.0) < 1e-9)
    expected.foreach { case (e, n) =>
      assert(math.abs(s(("c1", e)) - n.toDouble / occurrences.size) < 1e-9, s"envo $e")
    }
  }

  test("fused scoreWithEvidence == classic score + evidence agg, row for row") {
    import org.apache.spark.sql.functions._
    // the fused path is the plan under the o2/o6/o10/o12 hashes — its rows
    // must be IDENTICAL to the classic composition for every flat config
    val turns = miniTurns ++ Seq(
      turn("c2", 0, "lake mud of the lake", None),
      turn("c2", 5, "marine wetland", Some("t1")),
      turn("c2", 9, "marine wetland", Some("t1")))
    val pipeline = new KgPipeline(spark)
    val rows = MentionDetect.envoRows(MentionDetect.detect(spark, turns.toDS.toDF))
    for (proportional <- Seq(true, false)) {
      val cfg = ScoreConfig(normalization = "flat", proportional = proportional)
      val fused = LinkScore.scoreWithEvidence(spark, rows, cfg, evidenceCap = 2)
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getDouble(2), r.getLong(3), r.getSeq[Int](4).toList))).toMap
      val classicScores = LinkScore.score(spark, rows, pipeline.dict, cfg)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
      val classicSupport = rows.groupBy("conv_id", "envo")
        .agg(countDistinct("turn_idx").as("n"),
          graft.functions.GraftFunctions.bounded_min_set(spark, col("turn_idx"), 2).as("ts"))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getLong(2), r.getSeq[Int](3).toList))).toMap
      assert(fused.keySet === classicScores.keySet)
      fused.foreach { case (k, (score, nTurns, sample)) =>
        assert(score === classicScores(k), s"score mismatch at $k")
        assert((nTurns, sample) === classicSupport(k), s"evidence mismatch at $k")
      }
    }
    // non-flat configs must refuse the fused path loudly
    intercept[IllegalArgumentException] {
      LinkScore.scoreWithEvidence(spark, rows, ScoreConfig(normalization = "ui"), 2)
    }
  }

  test("conversations with no mentions are absent from the output") {
    val turns = Seq(
      turn("c1", 0, "the ocean was calm", None),
      turn("c2", 0, "no dictionary words in here at all", None))
    val s = scores(turns, ScoreConfig())
    assert(s.keys.map(_._1).toSet === Set("c1"))
  }
}
