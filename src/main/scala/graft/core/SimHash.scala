package graft.core

/** 64-bit SimHash over token multisets (Charikar 2002) — near-dup
  * fingerprinting for the LLM-pipeline dedup surface. Pure Scala.
  *
  * Not present in the reference (which uses MinHash only); added per the
  * engine's training-data-pipeline extensions.
  */
object SimHash {
  /** xxhash-based 64-bit token hash: two xxh32 calls with different salts. */
  @inline def tokenHash64(tok: String): Long = {
    val lo = MinHash.xxhash32(tok)
    val hi = MinHash.xxhash32(tok + "s")
    (hi << 32) | lo
  }

  def simhash(tokens: IterableOnce[String]): Long = {
    val counts = new Array[Int](64)
    tokens.iterator.foreach { t =>
      val h = tokenHash64(t)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
