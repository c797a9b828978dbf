package graft.ops

/** Deterministic, portable 64-bit hashing for the sketch operators
  * (MinHash, SimHash, LSH). Self-contained (no JVM hashCode, which is
  * unspecified across versions) so signatures are stable across runs,
  * Spark versions and cluster topologies.
  */
object Hashing {

  /** 64-bit splitmix-style avalanche. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a over UTF-8 bytes, then avalanched. */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** The i-th member of a deterministic hash family applied to x. */
  @inline def family(x: Long, i: Int): Long =
    mix64(x + 0x9e3779b97f4a7c15L * (i + 1))
}
