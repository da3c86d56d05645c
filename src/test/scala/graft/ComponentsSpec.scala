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
