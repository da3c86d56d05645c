package graft.dict

import scala.collection.mutable
import scala.io.Source

/**
 * The EnvO concept dictionary: concepts, surface forms, case-sensitive
 * stoplist, preferred names, and the ancestor closure.
 *
 * Data layout mirrors the reference's dictionary artifacts (the seqenv
 * `data_envo` TSVs; loading semantics at `seqenv/analysis.py:416-468` and
 * `seqenv/data_sources/add_tagger_results.py:43-53`):
 *  - entities: serial -> (type, CURIE), type -27 == EnvO
 *  - names:    serial -> surface form (many forms per serial; a form may map
 *              to several serials, e.g. "bank")
 *  - global:   case-sensitive blocked surface variants (e.g. `OCEAN` blocked
 *              while `ocean` matches; `air`/`Air`/`AIR` all blocked)
 *  - preferred: CURIE -> preferred display name (ENVO:root excluded)
 *  - groups:   child serial -> ancestor serial, transitive closure of the
 *              ontology DAG (used for backtracking + restrict)
 *
 * All structures are small (<10k rows) and built once on the driver, then
 * broadcast to executors.
 */
final case class EnvoDict(
    serialToCurie: Map[Long, String],
    formToSerials: Map[String, Array[Long]], // lowercased form -> sorted serials
    stoplist: Set[String],                   // raw case-sensitive blocked forms
    preferredName: Map[String, String],      // CURIE -> name
    closure: Map[Int, Array[Int]]            // envo int -> ancestor envo ints (ENVO:root dropped)
) extends Serializable {

  /** "ENVO:00000015" -> 15; non-numeric suffixes (ENVO:root) -> None. */
  def curieToInt(curie: String): Option[Int] =
    EnvoDict.curieToInt(curie)

  val serialToEnvoInt: Map[Long, Int] =
    serialToCurie.flatMap { case (s, c) => EnvoDict.curieToInt(c).map(s -> _) }

  val intToCurie: Map[Int, String] =
    serialToCurie.values.flatMap(c => EnvoDict.curieToInt(c).map(_ -> c)).toMap

  def nameOf(curie: String): String = preferredName.getOrElse(curie, curie)

  /** Strict descendants of `root` (root itself excluded), as envo ints.
    * descends(e, root) == root ∈ closure(e) — matches the reference's
    * graph-reachability predicate (`seqenv/ontology.py:186-193`, where the
    * restrict node itself is not its own descendant). */
  def descendantsOf(root: Int): Set[Int] =
    closure.iterator.collect { case (child, ancs) if ancs.contains(root) => child }.toSet

  /** md5 over a canonical serialization of EVERY output-affecting table
    * (form→serials mapping, stoplist, closure, serial→curie, preferred
    * names) — the
    * dictionary identity used by checkpoint fingerprints and broadcast
    * caching. Hashing only the form KEY SET is not enough: two dicts with
    * the same surface forms but a different form→concept mapping (a
    * re-versioned domain dictionary) produce different triples and must
    * never share a checkpoint. Computed once per instance. */
  @transient lazy val contentDigest: String = {
    val sb = new StringBuilder
    // Every free-form STRING field is length-prefixed ("<len>:<bytes>"):
    // surface forms / names may themselves contain '='/';'/','/'|', and with
    // bare separators two DIFFERENT dictionaries could serialize to the same
    // canonical string (e.g. a form ending "=1" vs a serial list starting
    // "1"), colliding the checkpoint/broadcast identity. A length prefix
    // makes the serialization prefix-free regardless of field content.
    def str(s: String): Unit = { sb.append(s.length).append(':').append(s) }
    formToSerials.toSeq.sortBy(_._1).foreach { case (f, ss) =>
      str(f); sb.append('=').append(ss.sorted.mkString(",")).append(';')
    }
    sb.append('|')
    stoplist.toSeq.sorted.foreach { s => str(s); sb.append(';') }
    sb.append('|')
    closure.toSeq.sortBy(_._1).foreach { case (c, as) =>
      sb.append(c).append('=').append(as.sorted.mkString(",")).append(';')
    }
    sb.append('|')
    serialToCurie.toSeq.sortBy(_._1).foreach { case (s, c) =>
      sb.append(s).append('='); str(c); sb.append(';')
    }
    sb.append('|')
    // preferredName feeds the triples' `name` column (TripleEmit via
    // Canonicalize) — a name-only dictionary revision is still a different
    // dictionary for checkpoint purposes
    preferredName.toSeq.sortBy(_._1).foreach { case (c, n) =>
      str(c); sb.append('='); str(n); sb.append(';')
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sb.toString.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
  }
}

object EnvoDict {

  def curieToInt(curie: String): Option[Int] = {
    if (curie.length > 5 && curie.startsWith("ENVO:")) {
      val suffix = curie.substring(5)
      if (suffix.forall(_.isDigit)) Some(suffix.toInt) else None
    } else None
  }

  private def readResource(path: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    Source.fromInputStream(in, "UTF-8").getLines()
  }

  /** Load the dictionary from bundled resources (the reference's data_envo
    * TSVs, copied verbatim as test/build fixtures per FIXTURES.md §2). */
  def load(dir: String = "/data_envo"): EnvoDict = {
    // entities: serial \t type \t CURIE
    val serialToCurie = readResource(s"$dir/envo_entities.tsv").flatMap { line =>
      val cols = line.split("\t")
      if (cols.length >= 3) Some(cols(0).trim.toLong -> cols(2).trim) else None
    }.toMap

    // names: serial \t form
    val formMap = mutable.HashMap.empty[String, mutable.TreeSet[Long]]
    readResource(s"$dir/envo_names.tsv").foreach { line =>
      val i = line.indexOf('\t')
      if (i > 0) {
        val serial = line.substring(0, i).trim.toLong
        val form = line.substring(i + 1).trim
        if (form.nonEmpty)
          formMap.getOrElseUpdate(form.toLowerCase(java.util.Locale.ROOT),
            mutable.TreeSet.empty[Long]) += serial
      }
    }

    // global stoplist: form \t t  (flag 't' == blocked, case-sensitive)
    val stop = readResource(s"$dir/envo_global.tsv").flatMap { line =>
      val i = line.lastIndexOf('\t')
      if (i > 0 && line.substring(i + 1).trim == "t") Some(line.substring(0, i))
      else None
    }.toSet

    // preferred: CURIE \t name, ENVO:root skipped (seqenv/analysis.py:448-453)
    val preferred = readResource(s"$dir/envo_preferred.tsv").flatMap { line =>
      val cols = line.stripLineEnd.split("\t")
      if (cols.length >= 2 && cols(0) != "ENVO:root") Some(cols(0) -> cols(1)) else None
    }.toMap

    // groups: childSerial \t ancestorSerial (transitive closure).
    // Keyed by envo INT with int values — the documented intent of the
    // reference's child_to_parents (its v1.3.0 str-vs-int key mismatch made
    // backtracking a silent no-op; we implement the intent, see SURVEY §2.4 A5).
    val closureMap = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
    readResource(s"$dir/envo_groups.tsv").foreach { line =>
      val cols = line.split("\t")
      if (cols.length >= 2) {
        for {
          c <- serialToCurie.get(cols(0).trim.toLong).flatMap(curieToInt)
          p <- serialToCurie.get(cols(1).trim.toLong).flatMap(curieToInt)
        } closureMap.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += p
      }
    }

    EnvoDict(
      serialToCurie = serialToCurie,
      formToSerials = formMap.iterator.map { case (k, v) => k -> v.toArray }.toMap,
      stoplist = stop,
      preferredName = preferred,
      closure = closureMap.iterator.map { case (k, v) => k -> v.distinct.sorted.toArray }.toMap
    )
  }
}
