package graft.util

/** Deterministic 64-bit hashing used everywhere randomness-like behavior is
  * needed (scorer weights, dropout decisions, synthetic corpus): FNV-1a over
  * UTF-16 code units. No wall-clock, no JVM-version dependence — required for
  * checkpoint-resume determinism (SURVEY.md §4.5) and stable ids at scale
  * (replaces the reference's positional reindex, clean_and_save.py:1078-1080).
  */
object Hashing {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a64(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      h ^= (c & 0xff); h *= FnvPrime
      h ^= ((c >> 8) & 0xff); h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64(parts: String*): Long = fnv1a64(parts.mkString(""))

  /** Hash → [0, 1). */
  def unit(h: Long): Double = ((h >>> 11).toDouble / (1L << 53).toDouble)

  def unit(parts: String*): Double = unit(fnv1a64(parts: _*))

  /** Non-negative 63-bit id (for `ind` etc.). */
  def id63(parts: String*): Long = fnv1a64(parts: _*) & Long.MaxValue

  /** splitmix64 finalizer — numeric mixing for hot paths where building a
    * String key per lookup would dominate (CRF scorer emissions/dropout).
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def mix(a: Long, b: Long): Long = mix(a ^ mix(b))
  def mix(a: Long, b: Long, c: Long): Long = mix(a ^ mix(b ^ mix(c)))

  /** Lowercase hex md5 of the UTF-8 bytes — byte-identical to SQL engines'
    * md5(), used where a boundary/fingerprint must be re-derivable by the
    * DuckDB oracle (FNV/splitmix stay the hot-path hashes).
    */
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
