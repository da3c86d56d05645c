package graft.tools

import graft.KgPipeline
import graft.synth.TranscriptGen

/** Single-thread microbenchmark of the Aho-Corasick tagger itself —
  * separates automaton cost from Spark overhead. */
object BenchTagger {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val ac = KgPipeline.sharedAutomaton
    val texts = (0L until (n / 7 + 1).toLong)
      .flatMap(i => TranscriptGen.turnsFor(i, 42L, 6, 1, verbosity = 6).map(_.text))
      .take(n).toArray
    val totalBytes = texts.map(_.length.toLong).sum
    // warmup
    var w = 0
    for (i <- 0 until math.min(n, 20000)) w += ac.tag(texts(i)).length
    // timed
    val t0 = System.nanoTime()
    var mentions = 0L
    var i = 0
    while (i < texts.length) { mentions += ac.tag(texts(i)).length; i += 1 }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"texts=$n bytes=$totalBytes mentions=$mentions sec=$sec%.2f " +
      f"-> ${totalBytes / sec / 1e6}%.1f MB/s/core, ${n / sec}%.0f texts/s/core (warm=$w)")
  }
}
