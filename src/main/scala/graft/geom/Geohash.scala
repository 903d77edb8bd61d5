package graft.geom

/**
 * Geohash encoding (public domain algorithm, Niemeyer 2008): interleave
 * longitude/latitude interval-halving bits (lon first) and emit base32
 * characters, 5 bits each. The closed form used here —
 * `lonIdx = floor((lon+180)/360 * 2^lonBits)` then bit-interleave — is
 * exactly equivalent to the canonical per-bit interval halving, and is
 * also expressible in plain SQL (the DuckDB oracle mirrors it).
 *
 * Geohash is the 100 TB spatial-bucketing workhorse: a prefix of length k
 * is a grid cell, so GROUP BY / partitionBy / range predicates on prefixes
 * cluster spatially without any index structure.
 */
object Geohash {
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Encode a lon/lat to `precision` base32 chars (1..12); null-range
    * inputs (|lon|>180, |lat|>90, NaN) => null. */
  def encode(lon: Double, lat: Double, precision: Int): String = {
    if (precision < 1 || precision > 12) return null
    if (!(lon >= -180 && lon <= 180 && lat >= -90 && lat <= 90)) return null
    val totalBits = 5 * precision
    val lonBits = (totalBits + 1) / 2
    val latBits = totalBits / 2
    val lonIdx = math.min(((lon + 180.0) / 360.0 * (1L << lonBits)).toLong, (1L << lonBits) - 1)
    val latIdx = math.min(((lat + 90.0) / 180.0 * (1L << latBits)).toLong, (1L << latBits) - 1)
    var bits = 0L
    var i = 0
    while (i < totalBits) {
      val bit =
        if (i % 2 == 0) (lonIdx >> (lonBits - 1 - i / 2)) & 1L
        else (latIdx >> (latBits - 1 - i / 2)) & 1L
      bits = (bits << 1) | bit
      i += 1
    }
    val sb = new java.lang.StringBuilder(precision)
    var j = precision - 1
    while (j >= 0) {
      sb.append(Alphabet.charAt(((bits >> (5 * j)) & 31L).toInt))
      j -= 1
    }
    sb.toString
  }

  /** Decode a geohash to its cell's (lonMin, latMin, lonMax, latMax);
    * null for an empty or invalid string. */
  def decodeBounds(hash: String): Array[Double] = {
    if (hash == null || hash.isEmpty || hash.length > 12) return null
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    var even = true
    var i = 0
    while (i < hash.length) {
      val cd = Alphabet.indexOf(hash.charAt(i).toLower)
      if (cd < 0) return null
      var mask = 16
      while (mask > 0) {
        if (even) {
          val mid = (lonMin + lonMax) / 2
          if ((cd & mask) != 0) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if ((cd & mask) != 0) latMin = mid else latMax = mid
        }
        even = !even
        mask >>= 1
      }
      i += 1
    }
    Array(lonMin, latMin, lonMax, latMax)
  }
}
