package graft.dict

import scala.collection.mutable
import scala.io.Source

/** One ontology edge: child --rel--> parent (e.g. ocean is_a water body). */
final case class OboEdge(child: String, rel: String, parent: String)

/**
 * Minimal OBO 1.2 stanza parser for the EnvO ontology — the build-time
 * replacement for the reference's orange-bio `OBOOntology` wrapper
 * (seqenv/ontology.py:46-56,88-97). Extracts `[Term]` stanzas with their
 * `is_a:` and `relationship:` edges; obsolete terms carry no edges here
 * (they have none in the file) but are retained in `terms` for id lookups.
 *
 * `closure` regenerates the ancestor transitive closure over ALL edge
 * types — verified in tests to equal the reference's precomputed
 * `envo_groups.tsv` (9536 child→ancestor rows) exactly.
 */
object Obo {

  final case class Term(id: String, name: String, obsolete: Boolean)

  /** The synthetic top node the reference's dictionary build grafts above
    * EnvO's parentless upper-level classes (observed in envo_groups.tsv:
    * biome ENVO:00000428, environmental feature ENVO:00002297,
    * environmental material ENVO:00010483 and ENVO:01000203 all close to
    * ENVO:root, while the orphan `habitat` branch does not). */
  val RootId = "ENVO:root"

  final case class Ontology(terms: Map[String, Term], edges: Seq[OboEdge]) {
    /** child -> direct parents over ALL relation types (for typed KG edges). */
    lazy val parents: Map[String, Seq[String]] =
      edges.groupBy(_.child).view.mapValues(_.map(_.parent).distinct).toMap

    /** child -> direct ancestors over is_a + part_of ONLY, with the virtual
      * root attached above every term that has neither (except habitat) —
      * brute-force verified as the exact generating rule of the reference's
      * envo_groups.tsv closure (0 missing / 0 extra rows). */
    lazy val closureParents: Map[String, Seq[String]] = {
      val direct = edges.filter(e => e.rel == "is_a" || e.rel == "part_of")
        .groupBy(_.child).view.mapValues(_.map(_.parent).distinct).toMap
      val rootChildren = terms.values.collect {
        case t if !t.obsolete && !direct.contains(t.id) && t.name != "habitat" => t.id
      }
      direct ++ rootChildren.map(c => c -> Seq(RootId))
    }

    /** Full ancestor closure (is_a + part_of + virtual root):
      * child -> every reachable ancestor. Equals envo_groups.tsv. */
    lazy val closure: Map[String, Set[String]] = {
      val memo = mutable.HashMap.empty[String, Set[String]]
      def ancestors(id: String, seen: Set[String]): Set[String] =
        memo.getOrElseUpdate(id, {
          val ps = closureParents.getOrElse(id, Nil).filterNot(seen)
          ps.toSet ++ ps.flatMap(p => ancestors(p, seen + id))
        })
      terms.keys.map(id => id -> ancestors(id, Set(id))).toMap
    }
  }

  def parseResource(path: String = "/data_envo/envo.obo"): Ontology = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    parse(Source.fromInputStream(in, "UTF-8").getLines())
  }

  def parse(lines: Iterator[String]): Ontology = {
    val terms = mutable.HashMap.empty[String, Term]
    val edges = mutable.ArrayBuffer.empty[OboEdge]
    var inTerm = false
    var id: String = null
    var name: String = ""
    var obsolete = false
    val pending = mutable.ArrayBuffer.empty[(String, String)] // (rel, parent)

    def flush(): Unit = {
      if (inTerm && id != null) {
        terms(id) = Term(id, name, obsolete)
        pending.foreach { case (rel, parent) => edges += OboEdge(id, rel, parent) }
      }
      id = null; name = ""; obsolete = false; pending.clear()
    }

    lines.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("[")) {
        flush()
        inTerm = line == "[Term]"
      } else if (inTerm) {
        if (line.startsWith("id: ")) id = line.substring(4).trim
        else if (line.startsWith("name: ")) name = line.substring(6).trim
        else if (line.startsWith("is_obsolete: true")) obsolete = true
        else if (line.startsWith("is_a: "))
          pending += (("is_a", line.substring(6).takeWhile(_ != '!').trim))
        else if (line.startsWith("relationship: ")) {
          val parts = line.substring(14).takeWhile(_ != '!').trim.split("\\s+")
          if (parts.length >= 2) pending += ((parts(0), parts(1)))
        }
      }
    }
    flush()
    Ontology(terms.toMap, edges.toSeq)
  }
}
