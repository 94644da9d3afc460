package graft.kg

/** Single-threaded parse throughput baseline (docs/s/core, triples/s/core)
  * — the single-node number BENCH results are compared against
  * (BASELINE.md: the reference publishes no numbers; this pins ours). */
object ParseBaseline {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(500)
    val docs = (0 until n).map(i => Corpus.doc(42L, i.toLong, n.toLong))
    val t0 = System.nanoTime()
    var triples = 0
    docs.foreach { gd => triples += graft.parse.RfcDoc.parse(gd.src).triples.size }
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$n docs, $triples triples, $sec%.2f s, ${n / sec}%.0f docs/s/core, ${triples / sec}%.0f triples/s/core")
  }
}
