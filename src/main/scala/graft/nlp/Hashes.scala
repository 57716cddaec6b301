package graft.nlp

/** Deterministic, engine-owned hash functions used by the dedup and
  * fingerprinting operators. All are fully specified here (no dependence
  * on JVM `hashCode` or Spark internals) so results are stable across
  * partitions, executors and Spark versions — a requirement for
  * checkpoint-resumable stages.
  */
object Hashes {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit avalanche (splitmix64 finalizer) — used to derive independent
    * MinHash permutations from one base hash.
    */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature of a shingle set: perm i applies mix64 with an
    * i-derived salt to the shingle's fnv hash and takes the min.
    */
  def minhash(shingles: Iterable[Long], numPerm: Int): Array[Long] = {
    val sig = Array.fill(numPerm)(Long.MaxValue)
    shingles.foreach { h =>
      var i = 0
      while (i < numPerm) {
        val v = mix64(h ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** 64-bit SimHash over weighted features (feature hash → weight). */
  def simhash(features: Iterator[(Long, Int)]): Long = {
    val acc = new Array[Int](64)
    features.foreach { case (h, w) =>
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += w else acc(bit) -= w
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling polynomial document fingerprint: base-257 polynomial over
    * UTF-8 bytes modulo the Mersenne prime 2^61-1.
    */
  def fingerprint(s: String): Long = {
    val MOD = (1L << 61) - 1
    var h = 0L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      // h = (h * 257 + b) mod 2^61-1, using 128-bit-safe split multiply
      val hi = h >>> 32
      val lo = h & 0xffffffffL
      // h*257 = hi*257*2^32 + lo*257; reduce mod 2^61-1 via shifts
      var t = lo * 257 + (bytes(i) & 0xffL)
      var u = hi * 257 // multiply the 2^32 part
      // u * 2^32 mod (2^61-1): (u << 32) = (u >> 29) + ((u << 32) & MOD)
      t += ((u << 32) & MOD) + (u >>> 29)
      h = (t & MOD) + (t >>> 61)
      if (h >= MOD) h -= MOD
      i += 1
    }
    h
  }

  /** Word n-gram shingle hashes of a pre-tokenized document. */
  def shingles(words: IndexedSeq[String], n: Int): Set[Long] = {
    if (words.length < n) Set(fnv1a64(words.mkString(" ")))
    else (0 to words.length - n).iterator
      .map(i => fnv1a64(words.slice(i, i + n).mkString(" ")))
      .toSet
  }
}
