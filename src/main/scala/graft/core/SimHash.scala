package graft.core

/** 64-bit SimHash over token multisets (Charikar 2002) — near-dup
  * fingerprinting for the LLM-pipeline dedup surface. Pure Scala.
  *
  * Not present in the reference (which uses MinHash only); added per the
  * engine's training-data-pipeline extensions.
  */
object SimHash {
  /** 64-bit token hash: low 64 bits of MD5 — bit-identical to DuckDB's
    * `md5_number_lower(tok)`, so fingerprints are verifiable by an
    * independent SQL engine (same rationale as [[MinHash.md5Low32]]). */
  @inline def tokenHash64(tok: String): Long = MinHash.md5Low64(tok)

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
