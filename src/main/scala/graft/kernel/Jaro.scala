package graft.kernel

/** Jaro-Winkler string similarity (public algorithm; used by the
  * reference's fuzzy entity linking via the strsim crate,
  * /root/reference/src/entity_linker.rs:375-387). Standard parameters:
  * prefix scale 0.1, max prefix 4, no boost threshold (strsim applies the
  * Winkler boost whenever jaro > 0.7 — replicated). */
object Jaro {

  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(a.length, b.length) / 2 - 1
    val aFlags = new Array[Boolean](a.length)
    val bFlags = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlags(j) && a.charAt(i) == b.charAt(j)) {
          aFlags(i) = true; bFlags(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aFlags(i)) {
        while (!bFlags(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - transpositions / 2.0) / m) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) return j
    var prefix = 0
    val maxP = math.min(4, math.min(a.length, b.length))
    while (prefix < maxP && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }
}
