package graft.kernel

import java.text.Normalizer

/** Entity-name slugification — the engine's deterministic IRI-minting
  * primitive.
  *
  * Semantics match the reference's `normalize_entity_name`
  * (/root/reference/src/normalize.rs:27-31): transliterate Unicode to
  * ASCII, lowercase, collapse non-alphanumeric runs to a single
  * separator, then use `_` (the reference slugifies to `-` and replaces
  * with `_`). Golden values from /root/reference/src/normalize.rs:149-175:
  * "Alan Bean"→"alan_bean", "José García"→"jose_garcia",
  * "Björk Guðmundsdóttir"→"bjork_gudmundsdottir", "Cañón City"→"canon_city",
  * "AT&T Corporation"→"at_t_corporation", "O'Reilly Media"→"o_reilly_media".
  */
object Slug {

  // Transliterations NFD decomposition cannot produce (no combining form).
  private val translit: Map[Char, String] = Map(
    'ð' -> "d", 'Ð' -> "D", 'þ' -> "th", 'Þ' -> "Th",
    'ø' -> "o", 'Ø' -> "O", 'æ' -> "ae", 'Æ' -> "AE",
    'œ' -> "oe", 'Œ' -> "OE", 'ß' -> "ss", 'ł' -> "l", 'Ł' -> "L",
    'đ' -> "d", 'Đ' -> "D", 'ı' -> "i", 'ħ' -> "h", 'Ħ' -> "H"
  )

  /** ASCII-transliterate: NFD + strip combining marks + special map. */
  def toAscii(s: String): String = {
    val mapped = new StringBuilder(s.length)
    s.foreach { c => mapped.append(translit.getOrElse(c, c.toString)) }
    val nfd = Normalizer.normalize(mapped.toString, Normalizer.Form.NFD)
    val out = new StringBuilder(nfd.length)
    nfd.foreach { c =>
      if (Character.getType(c) != Character.NON_SPACING_MARK && c < 128) out.append(c)
    }
    out.toString
  }

  /** Slugify with `_` separator (reference normalize.rs:30). */
  def slug(name: String): String = {
    val ascii = toAscii(name).toLowerCase
    val sb = new StringBuilder(ascii.length)
    var pendingSep = false
    ascii.foreach { c =>
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSep && sb.nonEmpty) sb.append('_')
        pendingSep = false
        sb.append(c)
      } else pendingSep = true
    }
    sb.toString
  }
}
