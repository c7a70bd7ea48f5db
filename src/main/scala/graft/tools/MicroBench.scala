package graft.tools

import graft.core.Corpus
import graft.analysis.{Tokenizers, TokenizeMode}

/** Thread-scaling microbench for the analysis hot path (dev tool; run with
  * scripts/bench_java.sh GRAFT_MAIN=graft.tools.MicroBench). Isolates the
  * tokenize+combine kernel from Spark scheduling so allocation-pressure
  * scaling limits are visible directly.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 8000
    val docs = (0 until nDocs).map(i => Corpus.file(42L, i.toLong).content).toArray
    val tok = Tokenizers.byName("TokenBigram")
    @volatile var sink = 0L
    docs.take(2000).foreach(d => sink += tok.tokenize(d, TokenizeMode.Add).size)
    val rounds = if (args.length > 1) args(1).toInt else 10
    def leg(threads: Int): Double = {
      val total = nDocs.toLong * rounds
      val t0 = System.nanoTime()
      val ctr = new java.util.concurrent.atomic.AtomicLong(0)
      val ts = (0 until threads).map { _ => new Thread(() => {
        val comb = new graft.index.DocCombiner(true)
        var s = 0L
        var i = ctr.getAndIncrement()
        while (i < total) {
          s += graft.index.DocCombiner.docPostings(tok, comb, i, docs((i % nDocs).toInt)).length
          i = ctr.getAndIncrement()
        }
        sink += s
      })}
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      total / sec
    }
    // The sandbox host throttles CPU in multi-second bursts (~30x swings):
    // interleave many short legs per parallelism level and keep the best —
    // approximates un-throttled capability at each level.
    val levels = Seq(1, 8, 32)
    val best = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    for (rep <- 1 to 8; t <- levels) {
      val r = leg(t)
      if (r > best(t)) best(t) = r
      System.err.println(f"rep $rep threads=$t%2d: $r%.0f docs/s")
    }
    for (t <- levels) println(f"threads=$t%2d best: ${best(t)}%.0f docs/s")
    println(f"eff 8->32: ${best(32) / best(8) / 4}%.2f   1->8: ${best(8) / best(1) / 8}%.2f")
    System.err.println(sink)
  }
}
