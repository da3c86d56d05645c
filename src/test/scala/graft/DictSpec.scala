package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dict.{AhoCorasick, EnvoDict}

class DictSpec extends AnyFunSuite {
  lazy val dict: EnvoDict = KgPipeline.sharedDict

  test("dictionary cardinalities match the reference artifacts") {
    assert(dict.serialToCurie.size === 1640)
    assert(dict.stoplist.size === 732)
    assert(dict.formToSerials.valuesIterator.map(_.length).sum >= 6000)
    assert(dict.preferredName.size === 1178) // 1179 rows minus ENVO:root
    // 9536 closure rows minus the 1532 whose ancestor is the non-numeric
    // ENVO:root (dropped from the int-keyed closure) minus a few duplicates
    assert(dict.closure.valuesIterator.map(_.length).sum === 7990)
  }

  test("serial -> CURIE -> int -> preferred-name chain (ocean)") {
    // serial 1007000016 = ocean = ENVO:00000015 (reference envo_entities/names)
    assert(dict.serialToCurie(1007000016L) === "ENVO:00000015")
    assert(dict.serialToEnvoInt(1007000016L) === 15)
    assert(dict.intToCurie(15) === "ENVO:00000015")
    assert(dict.nameOf("ENVO:00000015") === "ocean")
    assert(EnvoDict.curieToInt("ENVO:root").isEmpty)
  }

  test("closure: ocean has ancestors including water body; descendants sane") {
    val oceanAnc = dict.closure(15)
    assert(oceanAnc.contains(63), s"ocean ancestors should include water body 63: ${oceanAnc.mkString(",")}")
    // water body's strict descendants include ocean and lake, not itself
    val desc = dict.descendantsOf(63)
    assert(desc.contains(15) && desc.contains(20))
    assert(!desc.contains(63))
  }

  test("multi-concept form: marine maps to two concepts") {
    val serials = dict.formToSerials("marine")
    assert(serials.length === 2)
    val curies = serials.flatMap(dict.serialToEnvoInt.get).map(dict.intToCurie).sorted
    assert(curies === Array("ENVO:00000447", "ENVO:00000569"))
  }

  test("synonym canonicalization: every surface variant maps to the primary CURIE") {
    // ocean's synonym family (envo_names serial 1007000016) all collapse to
    // ENVO:00000015 — the J7 canonicalization chain
    for (form <- Seq("ocean", "oceans", "oceanic", "ocean region")) {
      val serials = dict.formToSerials(form)
      assert(serials.contains(1007000016L), s"form '$form'")
      assert(serials.flatMap(dict.serialToEnvoInt.get).contains(15))
    }
  }

  test("stoplist case semantics: OCEAN blocked, ocean allowed, air all-blocked") {
    assert(dict.stoplist.contains("OCEAN"))
    assert(!dict.stoplist.contains("ocean"))
    assert(Seq("air", "Air", "AIR").forall(dict.stoplist.contains))
    assert(Seq("bank", "Bank", "BANK").forall(dict.stoplist.contains))
  }
}

class AhoCorasickSpec extends AnyFunSuite {
  lazy val dict: EnvoDict = KgPipeline.sharedDict
  lazy val ac: AhoCorasick = KgPipeline.sharedAutomaton

  private def curies(text: String): Seq[String] =
    ac.tag(text).flatMap(_.envos).map(dict.intToCurie).toSeq

  test("golden isolation-source texts (reference generate.py:261-266)") {
    assert(curies("Everglades wetlands") === Seq("ENVO:00000043", "ENVO:00000043"))
    assert(curies("lake water at 5 m depth during dry season") === Seq("ENVO:00000020"))
    assert(curies("downstream along river bank") === Seq("ENVO:00000143"))
    assert(curies("aphotic layer; anoxic zone; tucurui hydroeletric power plant reservoir")
      === Seq("ENVO:00000210", "ENVO:00000025"))
    assert(curies("bacterioplankton sample from lake") === Seq("ENVO:00000020"))
  }

  test("case-sensitive stoplist blocking") {
    assert(curies("the OCEAN was calm").isEmpty)
    assert(curies("the ocean was calm") === Seq("ENVO:00000015"))
    assert(curies("fresh air in the morning").isEmpty)
    assert(curies("SOIL sample number four").isEmpty)
    // blocked variant only blocks the exact slice: Marine alone is blocked…
    assert(curies("Marine life thrives").isEmpty)
    // …but the longer form 'marine sediment' still matches as one span
    assert(curies("Marine sediment") === Seq("ENVO:00002113"))
  }

  test("multi-concept span: marine emits both concepts in one mention") {
    val spans = ac.tag("marine wetland")
    assert(spans.length === 2)
    assert(spans(0).form === "marine")
    assert(spans(0).envos.toSeq === Seq(447, 569))
    assert(spans(1).envos.toSeq === Seq(43))
  }

  test("token boundaries: no intra-word matches") {
    assert(curies("riverbank is one word").isEmpty)
    assert(curies("lakeshore2000").isEmpty)
    assert(curies("sub-lake region") === Seq("ENVO:00000020")) // '-' is a boundary
  }

  test("longest-leftmost non-overlapping selection") {
    // 'river bank' wins over 'river' (leftmost tie, longer)
    val spans = ac.tag("river bank erosion")
    assert(spans.map(_.form).toSeq === Seq("river bank"))
    // after a chosen span, matching resumes at its end
    assert(curies("hot spring water lake") === Seq("ENVO:00000051", "ENVO:00000020"))
  }

  test("offsets index the original string") {
    val Array(s) = ac.tag("xx Ocean yy")
    assert((s.start, s.end) === (3, 8))
    assert(s.form === "ocean")
  }
}
