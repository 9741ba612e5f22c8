package graft.tools

import graft.operators.ImageCodec

/** Dev-only scratch runner (not part of the driver contract). Edit
  * freely for ad-hoc measurements; keep `graft.tools.BenchOne` /
  * `graft.tools.PlanAudit` for repeatable timing / plan evidence. */
object Scratch {
  def main(args: Array[String]): Unit = {
    // measure dHash pairwise distances for the q85 fixture field: how many
    // non-planted pairs land within distance 3?
    val hashes = (0L until 300L).map { id =>
      val baseId = if (id % 10 == 1) id - 1 else id
      val bytes = ImageCodec.fixtureImage(baseId, 32, 24, perturbTopLeft = id % 10 == 1)
      id -> ImageCodec.decode(bytes).get.dHash
    }
    var planted = 0
    var extra = 0
    val hist = new Array[Int](65)
    for (i <- hashes.indices; j <- (i + 1) until hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2)
      hist(d) += 1
      if (d <= 3) {
        val (a, b) = (hashes(i)._1, hashes(j)._1)
        if (a % 10 == 0 && b == a + 1) planted += 1
        else { extra += 1; if (extra <= 15) println(s"extra: $a $b d=$d") }
      }
    }
    println(s"planted=$planted extra=$extra")
    println("distance histogram (0..20): " + hist.take(21).mkString(","))
  }
}
