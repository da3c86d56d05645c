package graft

import graft.ops.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains, cliques, isolated pairs") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val cc = Components.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L).forall(cc(_) == 20L))
  }

  test("dup clusters carry representative and size") {
    val pairs = Seq((5L, 9L), (9L, 7L), (30L, 31L)).toDF("doc_a", "doc_b")
    val clusters = Components.dupClusters(spark, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.toSet === Set(
      (5L, 5L, 3L), (7L, 5L, 3L), (9L, 5L, 3L),
      (30L, 30L, 2L), (31L, 30L, 2L)))
  }

  test("bfs depths: diamond, chain, multi-parent min, unreachable island") {
    // child -> parent edges toward root "r"; "e" has a long path via d and
    // a direct root edge (min must win); (x, y) is an unreachable island
    val edges = Seq(
      ("a", "r"), ("b", "r"), ("c", "a"), ("c", "b"),
      ("d", "c"), ("e", "d"), ("e", "r"), ("x", "y")).toDF("child", "parent")
    val d = Components.bfsDepths(spark, edges, "r")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(d === Map("r" -> 0, "a" -> 1, "b" -> 1, "c" -> 2, "d" -> 3, "e" -> 1))
  }

  test("bfs depths on the real ontology match a driver-side BFS") {
    val onto = graft.dict.Obo.parseResource()
    val edgePairs = onto.edges
      .filter(e => e.rel == "is_a" || e.rel == "part_of")
      .map(e => (e.child, e.parent)).distinct
    // deterministic root: the most-referenced parent (ties by curie)
    val root = edgePairs.groupBy(_._2).toSeq
      .maxBy { case (p, es) => (es.size, p) }._1
    // independent JDK BFS over the reverse adjacency
    val children = edgePairs.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val expected = scala.collection.mutable.Map(root -> 0)
    var frontier = Seq(root)
    var lvl = 0
    while (frontier.nonEmpty) {
      lvl += 1
      frontier = frontier.flatMap(p => children.getOrElse(p, Nil))
        .distinct.filterNot(expected.contains)
      frontier.foreach(c => expected(c) = lvl)
    }
    val got = Components.bfsDepths(spark, edgePairs.toDF("child", "parent"), root)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.size === expected.size)
    assert(got === expected.toMap)
  }

  test("bfs depths at maxIter boundary: loud non-convergence, partial depths consumable") {
    val chain = (0 until 8).map(i => (s"n${i + 1}", s"n$i")).toDF("child", "parent")
    val buf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val d = try {
      System.setErr(new java.io.PrintStream(buf, true))
      Components.bfsDepths(spark, chain, "n0", maxIter = 3)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    } finally System.setErr(realErr)
    assert(buf.toString.contains("did NOT converge"), buf.toString)
    // the reached prefix is exact even when the walk was cut short
    d.foreach { case (n, dep) => assert(dep === n.drop(1).toInt, s"$n") }
  }

  test("chain graph at maxIter boundary: loud non-convergence, labels still consumable") {
    // min-label propagation advances one hop per round, so a long chain
    // needs O(diameter) rounds — at maxIter below that the escape hatch
    // must fire LOUDLY (never silently return split components), and the
    // partial labels must still be safe: every node labeled, each label a
    // node of the same true component, monotone (label <= id)
    val n = 20
    val chain = (0L until n - 1L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val buf = new java.io.ByteArrayOutputStream()
    val realErr = System.err
    val labels = try {
      System.setErr(new java.io.PrintStream(buf, true))
      Components.connectedComponents(spark, chain, maxIter = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally System.setErr(realErr)
    assert(buf.toString.contains("did NOT converge"),
      "the non-convergence warning branch must fire")
    assert(labels.keySet === (0L until n).toSet, "every node keeps a label")
    labels.foreach { case (id, lbl) =>
      assert(lbl >= 0L && lbl <= id, s"node $id: label $lbl must be a same-component node <= id")
    }
    // and with enough rounds the same graph converges to one component
    val full = Components.connectedComponents(spark, chain)
      .collect().map(r => r.getLong(1)).toSet
    assert(full === Set(0L))
  }

  test("end to end: simhash pairs -> dedup clusters on testdata") {
    val pairs = graft.ops.DocOps.simhashPairs(spark, "/root/testdata/sf0.001", maxHamming = 8)
    val clusters = Components.dupClusters(spark, pairs)
    assert(clusters.count() > 0)
    // every cluster's representative is its own minimum member
    val bad = clusters.groupBy("representative")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("mn"))
      .filter($"representative" =!= $"mn").count()
    assert(bad === 0)
  }
}
