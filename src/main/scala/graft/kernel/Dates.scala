package graft.kernel

/** Deterministic English-date → ISO-8601 normalization.
  *
  * The reference's extraction spec demands "dates in ISO 8601 format
  * (YYYY-MM-DD) when explicitly mentioned"
  * (/root/reference/src/extractor.rs:22 rule 9), e.g.
  * "the 15th of March 1932" → "1932-03-15"
  * (tests/fixtures/test_cases.json:4-9). Recognized surface forms:
  *   "March 15, 1932" | "March 15 1932" | "15 March 1932" |
  *   "the 15th of March 1932" | "15th of March, 1932" | "1932-03-15".
  * Validation-side checks are weaker on purpose and replicated exactly
  * in [[Checks]].
  */
object Dates {

  private val months = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4,
    "may" -> 5, "june" -> 6, "july" -> 7, "august" -> 8,
    "september" -> 9, "october" -> 10, "november" -> 11, "december" -> 12)

  private val mdy = """(?i)\b([A-Za-z]+)\s+(\d{1,2})(?:st|nd|rd|th)?,?\s+(\d{4})\b""".r
  private val dmy = """(?i)\b(?:the\s+)?(\d{1,2})(?:st|nd|rd|th)?\s+(?:of\s+)?([A-Za-z]+),?\s+(\d{4})\b""".r
  private val iso = """\b(\d{4})-(\d{2})-(\d{2})\b""".r

  private def fmt(y: Int, m: Int, d: Int): String = f"$y%04d-$m%02d-$d%02d"

  /** First date found in the text, normalized to ISO-8601. */
  def findIso(text: String): Option[String] = {
    val isoHit = iso.findFirstMatchIn(text).map(m =>
      fmt(m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))
    if (isoHit.isDefined) return isoHit
    val mdyHit = mdy.findFirstMatchIn(text).flatMap { m =>
      months.get(m.group(1).toLowerCase).map(mo => fmt(m.group(3).toInt, mo, m.group(2).toInt))
    }
    if (mdyHit.isDefined) return mdyHit
    dmy.findFirstMatchIn(text).flatMap { m =>
      months.get(m.group(2).toLowerCase).map(mo => fmt(m.group(3).toInt, mo, m.group(1).toInt))
    }
  }
}

/** Reference validation predicates, replicated exactly (weaker than a
  * real parser on purpose — parity over strictness). */
object Checks {
  /** /root/reference/src/validation.rs:326-333: length==10 and '-' at
    * positions 4 and 7. ("32/03/15x1" would fail; "abcd-ef-gh" passes —
    * replicate the weak check.) */
  def isValidDate(s: String): Boolean =
    s.length == 10 && s.charAt(4) == '-' && s.charAt(7) == '-'

  /** /root/reference/src/validation.rs:335-337. */
  def isValidUrl(s: String): Boolean =
    s.startsWith("http://") || s.startsWith("https://")
}
