package graft

import java.nio.file.{Files, Paths}
import graft.sources.Outfmt6
import graft.stages.Salting

class SourcesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("outfmt-6 scan + P2/P3/P4: schema, filters, GI extraction, hit order") {
    val dir = Files.createTempDirectory("graft-o6").toString
    // qseqid sseqid pident length mismatch gapopen qstart qend sstart send evalue bitscore qcovs staxids
    Files.writeString(Paths.get(s"$dir/hits.tsv"),
      Seq(
        "C1\tgi|111|ref|X1\t99.0\t100\t0\t0\t1\t100\t1\t100\t1e-30\t500\t98.0\t562",
        "C1\tgi|222|ref|X2\t98.0\t100\t1\t0\t1\t100\t1\t100\t1e-20\t450\t50.0\t562",
        "C1\tgi|333|ref|X3\t90.0\t100\t9\t0\t1\t100\t1\t100\t1e-30\t400\t99.0\t562", // identity < 97
        "C2\tgi|444|ref|X4\t99.5\t100\t0\t0\t1\t100\t1\t100\t0.5\t100\t99.0\t562"    // evalue > 1e-4
      ).mkString("\n"))
    val raw = Outfmt6.read(spark, s"$dir/hits.tsv")
    assert(raw.schema.fieldNames.toSeq === Outfmt6.schema.fieldNames.toSeq)
    assert(raw.count() === 4)

    // reference defaults: coverage filter off (the documented no-op)
    val h = Outfmt6.hits(raw).collect()
    assert(h.map(_.getAs[Long]("gi")).toSet === Set(111L, 222L))
    assert(h.find(_.getAs[Long]("gi") == 111L).get.getAs[Int]("hit_pos") === 1)

    // flag-gated P3: min_coverage 0.97 drops the 50%-coverage hit
    val hc = Outfmt6.hits(raw, minCoverage = Some(0.97)).collect()
    assert(hc.map(_.getAs[Long]("gi")).toSet === Set(111L))
  }

  test("keepFirstByAgg equals window keep-first semantics") {
    val df = Seq(
      ("c1", 100L, 3, "x"), ("c1", 100L, 1, "y"), ("c1", 100L, 2, "z"),
      ("c1", 200L, 5, "w"), ("c2", 100L, 7, "v"))
      .toDF("conv_id", "text_hash", "turn_idx", "payload")
    val kept = Salting.keepFirstByAgg(df, Seq("conv_id", "text_hash"), "turn_idx")
      .select("conv_id", "text_hash", "turn_idx", "payload")
      .collect().map(_.toSeq).toSet
    assert(kept === Set(
      Seq("c1", 100L, 1, "y"), Seq("c1", 200L, 5, "w"), Seq("c2", 100L, 7, "v")))
  }

  test("salted repartition spreads a hot key across partitions") {
    val hot = (0 until 10000).map(i => ("hotconv", i)).toDF("conv_id", "turn_idx")
    val parts = Salting.saltedRepartition(hot, col("conv_id"), salt = 8, partitions = 8)
      .groupBy(spark_partition_id()).count().collect()
    assert(parts.length > 1, "hot key should span multiple partitions")
  }
}
