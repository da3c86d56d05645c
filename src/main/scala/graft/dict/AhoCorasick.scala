package graft.dict

import scala.collection.mutable

/** One detected mention span in a text. Offsets are [start, end) into the
  * original string; `serials` are all concept serials the matched form maps
  * to (a single span can link to multiple concepts — reference behavior
  * documented at seqenv/data_sources/add_tagger_results.py:59-62), and
  * `envos` the corresponding EnvO integer ids, sorted for determinism. */
final case class MentionSpan(
    start: Int,
    end: Int,
    form: String,
    serials: Array[Long],
    envos: Array[Int])

/**
 * Serializable Aho-Corasick automaton over the EnvO surface-form dictionary.
 *
 * Matching semantics pinned to the reference tagger's observable behavior
 * (dictionary + stoplist artifacts + docstring examples, see SURVEY §2.8):
 *   - case-insensitive matching of surface forms;
 *   - matches must start and end at token boundaries (the neighbor char is
 *     not a letter or digit);
 *   - a candidate is rejected when its *raw* (case-preserving) slice is an
 *     exact entry of the global stoplist (`OCEAN` blocked, `ocean` allowed);
 *   - longest-leftmost non-overlapping span selection;
 *   - a span carries every concept its form maps to.
 *
 * Built once on the driver and broadcast; `tag` is thread-safe (read-only).
 */
final class AhoCorasick private (
    // flat trie: per-node sorted char/next arrays for cache-friendly binary search
    private val nodeChars: Array[Array[Char]],
    private val nodeNext: Array[Array[Int]],
    private val fail: Array[Int],
    // dictionary-suffix output: for each node, ids of patterns ending here
    private val outputs: Array[Array[Int]],
    private val patterns: Array[String],          // lowercased forms
    private val patternSerials: Array[Array[Long]],
    private val patternEnvos: Array[Array[Int]],
    private val stoplist: Set[String]
) extends Serializable {

  /** Dense goto table for ASCII (the overwhelmingly common case): full
    * failure-transition closure precomputed, so scanning ASCII text is one
    * array load per character. Non-ASCII falls back to the sparse walk.
    * Size: nodes × 128 ints (~7 MB for the EnvO dictionary) — built once
    * per JVM after deserialization. */
  @transient private lazy val dense: Array[Int] = {
    val n = nodeChars.length
    val t = new Array[Int](n * 128)
    // BFS order guarantees fail(u) < processed-before-u in trie depth
    val depthOrder = {
      val order = new Array[Int](n)
      var idx = 0
      val queue = new java.util.ArrayDeque[Integer]()
      queue.add(0)
      val seen = new Array[Boolean](n)
      seen(0) = true
      while (!queue.isEmpty) {
        val u = queue.poll()
        order(idx) = u; idx += 1
        val cs = nodeChars(u); val nx = nodeNext(u)
        var i = 0
        while (i < cs.length) {
          if (!seen(nx(i))) { seen(nx(i)) = true; queue.add(nx(i)) }
          i += 1
        }
      }
      order
    }
    depthOrder.foreach { u =>
      val base = u * 128
      if (u == 0) java.util.Arrays.fill(t, 0, 128, 0)
      else System.arraycopy(t, fail(u) * 128, t, base, 128)
      val cs = nodeChars(u); val nx = nodeNext(u)
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        if (c < 128) t(base + c) = nx(i)
        i += 1
      }
    }
    t
  }

  @inline private def step(state: Int, c: Char): Int = {
    if (c < 128) return dense(state * 128 + c)
    var s = state
    while (true) {
      val idx = java.util.Arrays.binarySearch(nodeChars(s), c)
      if (idx >= 0) return nodeNext(s)(idx)
      if (s == 0) return 0
      s = fail(s)
    }
    0
  }

  @inline private def isWordChar(c: Char): Boolean = Character.isLetterOrDigit(c)

  /** All boundary-valid, non-stoplisted candidate hits (may overlap). */
  private def candidates(text: String): mutable.ArrayBuffer[(Int, Int, Int)] = {
    val n = text.length
    val hits = mutable.ArrayBuffer.empty[(Int, Int, Int)] // (start, end, patId)
    var state = 0
    var i = 0
    while (i < n) {
      state = step(state, Character.toLowerCase(text.charAt(i)))
      val outs = outputs(state)
      if (outs.length > 0) {
        val end = i + 1
        val endOk = end == n || !isWordChar(text.charAt(end))
        if (endOk) {
          var j = 0
          while (j < outs.length) {
            val pat = outs(j)
            val start = end - patterns(pat).length
            val startOk = start == 0 || !isWordChar(text.charAt(start - 1))
            if (startOk && !stoplist.contains(text.substring(start, end)))
              hits += ((start, end, pat))
            j += 1
          }
        }
      }
      i += 1
    }
    hits
  }

  /** Tag a text: longest-leftmost non-overlapping mention spans. */
  def tag(text: String): Array[MentionSpan] = {
    if (text == null || text.isEmpty) return Array.empty
    val hits = candidates(text)
    if (hits.isEmpty) return Array.empty
    // leftmost start first; for equal starts, longest span first
    val sorted = hits.sortBy { case (s, e, _) => (s, -e) }
    val out = mutable.ArrayBuffer.empty[MentionSpan]
    var lastEnd = 0
    var k = 0
    while (k < sorted.length) {
      val (s, e, pat) = sorted(k)
      if (s >= lastEnd) {
        out += MentionSpan(s, e, patterns(pat), patternSerials(pat), patternEnvos(pat))
        lastEnd = e
      }
      k += 1
    }
    out.toArray
  }
}

object AhoCorasick {

  /** Build the automaton from a loaded dictionary. */
  def build(dict: EnvoDict): AhoCorasick = {
    val forms = dict.formToSerials.keys.toArray.sorted // deterministic ids
    val serials = forms.map(dict.formToSerials)
    val envos = serials.map(_.flatMap(dict.serialToEnvoInt.get).distinct.sorted)

    // --- trie construction (mutable maps, flattened at the end) ---
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val ends = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    var p = 0
    while (p < forms.length) {
      var node = 0
      val f = forms(p)
      var i = 0
      while (i < f.length) {
        val c = f.charAt(i)
        node = children(node).getOrElseUpdate(c, {
          children += mutable.TreeMap.empty[Char, Int]
          ends += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
        i += 1
      }
      ends(node) += p
      p += 1
    }
    val n = children.length
    val fail = new Array[Int](n)
    val outputs = new Array[mutable.ArrayBuffer[Int]](n)
    var v = 0
    while (v < n) { outputs(v) = ends(v); v += 1 }

    // --- BFS failure links + output merging (dictionary suffixes) ---
    val queue = mutable.Queue.empty[Int]
    children(0).foreach { case (_, child) => fail(child) = 0; queue += child }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, child) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(child) = children(f).get(c).filter(_ != child).getOrElse(0)
        outputs(child) ++= outputs(fail(child))
        queue += child
      }
    }

    val nodeChars = Array.tabulate(n)(i => children(i).keys.toArray)
    val nodeNext = Array.tabulate(n)(i => children(i).values.toArray)
    new AhoCorasick(
      nodeChars, nodeNext, fail,
      outputs.map(_.toArray.distinct.sorted),
      forms, serials, envos, dict.stoplist)
  }
}
