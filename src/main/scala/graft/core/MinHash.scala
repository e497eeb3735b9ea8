package graft.core

import net.jpountz.xxhash.XXHashFactory

/** MinHash sketching core — pure Scala, no Spark dependency.
  *
  * Semantics follow the reference's column sketches
  * (`/root/reference/tabsketchfm/data_prep.py:31-32,264-274`): a
  * 100-permutation MinHash over a multiset of UTF-8 byte strings, permuted
  * by `(a*h + b) mod p` truncated to 32 bits, merged by elementwise min.
  *
  * Two documented divergences from the reference (SURVEY.md §7 "Hard
  * parts" (1) — digest-level parity is out of scope by design):
  *  - permutation constants come from a seeded JVM `SplittableRandom`
  *    rather than numpy's `RandomState`;
  *  - the base hash is the low 32 bits of MD5 rather than xxhash32. MD5 is
  *    computable by any engine (DuckDB: `md5_number_lower(v) & 0xffffffff`
  *    equals [[md5Low32]] bit-for-bit), which lets an independent SQL
  *    engine recompute whole digests and verify the entire sketch pipeline
  *    exactly — worth the ~10× slower base hash, which is still a minority
  *    of sketch cost next to the 100-slot permute loop.
  * Estimator accuracy, merge algebra, and digest shape are identical to
  * the reference.
  */
object MinHash {
  val NumPerm = 100
  val DefaultSeed = 0L

  /** Mersenne prime 2^61 - 1, same modulus family as common MinHash impls. */
  val MersennePrime: Long = (1L << 61) - 1
  val MaxHash: Long = (1L << 32) - 1

  private val xxFactory = XXHashFactory.fastestJavaInstance()

  /** xxhash32 of UTF-8 bytes, seed 0, as unsigned in a Long (kept for API
    * parity with the reference's base hash; not used in sketching). */
  def xxhash32(bytes: Array[Byte]): Long =
    xxFactory.hash32().hash(bytes, 0, bytes.length, 0) & 0xffffffffL

  def xxhash32(s: String): Long = xxhash32(s.getBytes("UTF-8"))

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** MD5 of the bytes (thread-local digest instance, reset per call). */
  def md5(bytes: Array[Byte]): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(bytes)
  }

  /** Base hash: little-endian uint32 of MD5 bytes [8,12) — bit-identical to
    * DuckDB's `md5_number_lower(v) & 4294967295`, so an independent engine
    * can recompute digests for verification. */
  def md5Low32(bytes: Array[Byte]): Long = {
    val d = md5(bytes)
    ((d(8) & 0xffL)) | ((d(9) & 0xffL) << 8) | ((d(10) & 0xffL) << 16) | ((d(11) & 0xffL) << 24)
  }

  def md5Low32(s: String): Long = md5Low32(s.getBytes("UTF-8"))

  /** Little-endian uint64 of MD5 bytes [8,16) (raw bits in a signed Long) —
    * bit-identical to DuckDB's `md5_number_lower(v)` UBIGINT. */
  def md5Low64(bytes: Array[Byte]): Long = {
    val d = md5(bytes)
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(8 + i) & 0xffL); i -= 1 }
    h
  }

  def md5Low64(s: String): Long = md5Low64(s.getBytes("UTF-8"))

  /** Permutation parameters (a odd-ish in [1, p), b in [0, p)). */
  final case class Perms(a: Array[Long], b: Array[Long])

  private val permCache = new java.util.concurrent.ConcurrentHashMap[(Long, Int), Perms]()

  def perms(seed: Long = DefaultSeed, numPerm: Int = NumPerm): Perms =
    permCache.computeIfAbsent((seed, numPerm), { _ =>
      val rng = new java.util.SplittableRandom(seed)
      val a = Array.fill(numPerm)(1L + rng.nextLong(MersennePrime - 1))
      val b = Array.fill(numPerm)(rng.nextLong(MersennePrime))
      Perms(a, b)
    })

  /** Fresh "empty" digest: all slots at MaxHash + 1 (no element seen). */
  def emptyDigest(numPerm: Int = NumPerm): Array[Long] =
    Array.fill(numPerm)(MaxHash + 1)

  /** (a*h + b) mod p, using Math.multiplyHigh-free 128-bit-safe arithmetic.
    * a, h < 2^61 so a*h overflows; use BigInt-free split multiplication.
    */
  @inline private def mulMod(a: Long, h: Long): Long = {
    // a * h mod MersennePrime via 128-bit product then Mersenne reduction.
    val hi = Math.multiplyHigh(a, h)
    val lo = a * h
    // value = hi * 2^64 + lo; reduce mod 2^61-1:
    // 2^64 = 8 * 2^61 = 8 * (p + 1) => 2^64 mod p = 8
    // lo mod p: lo = (lo >>> 61)*2^61 + (lo & p)  => (lo >>> 61) + (lo & p)
    var r = (hi % MersennePrime) * 8 + (lo >>> 61) + (lo & MersennePrime)
    while (r >= MersennePrime) r -= MersennePrime
    r
  }

  @inline def permuteInto(digest: Array[Long], h: Long, p: Perms): Unit = {
    var i = 0
    val n = digest.length
    while (i < n) {
      var v = mulMod(p.a(i), h) + p.b(i)
      if (v >= MersennePrime) v -= MersennePrime
      v = v & MaxHash
      if (v < digest(i)) digest(i) = v
      i += 1
    }
  }

  /** Update digest in place with one element's base-hash value. */
  @inline def updateInto(digest: Array[Long], value: String, p: Perms): Unit =
    permuteInto(digest, md5Low32(value), p)

  /** Elementwise-min merge (associative, commutative, idempotent). */
  def mergeInto(acc: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < acc.length) {
      if (other(i) < acc(i)) acc(i) = other(i)
      i += 1
    }
    acc
  }

  /** Sketch a whole multiset at once. */
  def sketch(values: IterableOnce[String], seed: Long = DefaultSeed,
             numPerm: Int = NumPerm): Array[Long] = {
    val p = perms(seed, numPerm)
    val d = emptyDigest(numPerm)
    values.iterator.foreach(v => updateInto(d, v, p))
    d
  }

  /** Jaccard estimate = fraction of equal digest slots. Empty vs empty = 1. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "digest length mismatch")
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Containment(A in B) estimate from Jaccard + distinct-count estimates:
    * |A∩B|/|A| ≈ J*(|A|+|B|)/((1+J)*|A|). Used for wiki-containment-style
    * labels (`/root/reference/README.md:113-121`).
    */
  def containment(jac: Double, cardA: Double, cardB: Double): Double =
    if (cardA <= 0) 0.0 else math.min(1.0, jac * (cardA + cardB) / ((1.0 + jac) * cardA))
}
