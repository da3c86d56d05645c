package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source
import graft.dict.{EnvoDict, Obo}

/** M0 check (SURVEY §7): the closure regenerated from envo.obo equals the
  * reference's precomputed envo_groups.tsv exactly. */
class OboSpec extends AnyFunSuite {
  lazy val onto: Obo.Ontology = Obo.parseResource()
  lazy val dict: EnvoDict = KgPipeline.sharedDict

  test("term and edge counts match the reference artifact") {
    assert(onto.terms.size === 1639)
    // 1609 is_a lines in the file; one belongs to a [Typedef] stanza
    assert(onto.edges.count(_.rel == "is_a") === 1608)
    assert(onto.edges.size === 1608 + 231)
    assert(onto.terms.values.count(_.obsolete) === 78)
  }

  test("regenerated closure equals envo_groups.tsv") {
    // groups file is serial→serial; map through entities to CURIE space
    val curieToSerial = dict.serialToCurie.map(_.swap)
    val expected: Set[(String, String)] =
      Source.fromInputStream(getClass.getResourceAsStream("/data_envo/envo_groups.tsv"), "UTF-8")
        .getLines().map { line =>
          val Array(c, p) = line.split("\t").map(_.trim.toLong)
          (dict.serialToCurie(c), dict.serialToCurie(p))
        }.toSet
    val regenerated: Set[(String, String)] = onto.closure.toSeq
      .flatMap { case (c, as) => as.map(a => (c, a)) }.toSet
    val missing = expected -- regenerated
    val extra = regenerated -- expected
    assert(missing.isEmpty, s"closure missing ${missing.size}: ${missing.take(5)}")
    assert(extra.isEmpty, s"closure extra ${extra.size}: ${extra.take(5)}")
    assert(curieToSerial.size === dict.serialToCurie.size) // bijection sanity
  }

  test("edge semantics: ocean lineage; typed relations present") {
    // 2013 EnvO: ocean is_a marine water body; water body is an ANCESTOR
    assert(onto.edges.contains(graft.dict.OboEdge("ENVO:00000015", "is_a", "ENVO:00001999")))
    assert(onto.closure("ENVO:00000015").contains("ENVO:00000063"))
    assert(onto.closure("ENVO:00000015").contains(Obo.RootId))
    val rels = onto.edges.map(_.rel).toSet
    assert(rels.contains("part_of") && rels.contains("located_in") && rels.contains("derives_from"))
  }
}
