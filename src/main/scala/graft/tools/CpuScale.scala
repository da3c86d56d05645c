package graft.tools

import java.util.concurrent.{Executors, TimeUnit}
import graft.KgPipeline
import graft.synth.TranscriptGen

/** Raw JVM thread-scaling probe (no Spark): tags the same corpus with T
  * threads. Separates "the host gives us N cores" from "Spark scales". */
object CpuScale {
  def main(args: Array[String]): Unit = {
    val texts = (0L until 30000L)
      .flatMap(i => TranscriptGen.turnsFor(i, 42L, 6, 1, verbosity = 6).map(_.text))
      .toArray
    val ac = KgPipeline.sharedAutomaton
    // warmup
    texts.take(20000).foreach(ac.tag)
    for (threads <- args.map(_.toInt)) {
      val pool = Executors.newFixedThreadPool(threads)
      val chunk = (texts.length + threads - 1) / threads
      val t0 = System.nanoTime()
      val futures = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = t * chunk
            val end = math.min(texts.length, (t + 1) * chunk)
            var acc = 0
            while (i < end) { acc += ac.tag(texts(i)).length; i += 1 }
          }
        })
      }
      futures.foreach(_.get())
      val sec = (System.nanoTime() - t0) / 1e9
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.SECONDS)
      println(f"threads=$threads%2d sec=$sec%6.2f texts/s=${texts.length / sec}%9.0f")
    }
  }
}
