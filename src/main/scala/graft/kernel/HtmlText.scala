package graft.kernel

/** Deterministic HTML → text extraction (operator P14 in SURVEY.md §2.2).
  *
  * The reference has no HTML handling (its inputs are plain text;
  * /root/reference/README.md:325-383 delegates PDF/HTML preprocessing to
  * external tools), so per the north rule *this* function is the spec:
  * `extract(render(text)) == text` byte-for-byte on the synthesized
  * Common-Crawl-style corpus. Render and extract are designed as exact
  * inverses for paragraph text that is already whitespace-normalized
  * (no leading/trailing space per paragraph, paragraphs separated by
  * "\n\n"), which the corpus generator guarantees.
  */
object HtmlText {

  /** Escape text for embedding in HTML (order matters: & first). */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def unescape(s: String): String = {
    // Longest entities first; &amp; last so produced ampersands aren't re-read.
    s.replace("&nbsp;", " ").replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
  }

  /** Render a plain-text document (paragraphs separated by "\n\n") into a
    * fixed Common-Crawl-style HTML template. Deterministic. */
  def render(title: String, text: String, lang: String): Array[Byte] = {
    val paras = text.split("\n\n", -1)
    val body = paras.map(p => s"    <p>${escape(p)}</p>").mkString("\n")
    val html =
      s"""<!DOCTYPE html>
         |<html lang="${escape(lang)}">
         |<head>
         |  <meta charset="utf-8"/>
         |  <title>${escape(title)}</title>
         |  <style>body{font-family:serif}</style>
         |  <script>var t=1;</script>
         |</head>
         |<body>
         |  <nav><a href="/">home</a></nav>
         |  <article>
         |$body
         |  </article>
         |  <footer>&copy; synthetic corpus</footer>
         |</body>
         |</html>
         |""".stripMargin
    html.getBytes("UTF-8")
  }

  private val scriptStyle = "(?is)<(script|style)\\b[^>]*>.*?</\\1>".r
  private val headBlock = "(?is)<head\\b[^>]*>.*?</head>".r
  private val navFooter = "(?is)<(nav|footer|header|aside)\\b[^>]*>.*?</\\1>".r
  private val pBlock = "(?is)<p\\b[^>]*>(.*?)</p>".r
  private val anyTag = "(?s)<[^>]*>".r

  /** Extract the text of an HTML page: paragraphs (`<p>` contents, tags
    * stripped, entities decoded, trimmed) joined by "\n\n". Pages without
    * `<p>` fall back to full-body tag-strip + whitespace collapse. */
  def extract(htmlBytes: Array[Byte]): String = {
    val html0 = new String(htmlBytes, "UTF-8")
    val html = navFooter.replaceAllIn(
      headBlock.replaceAllIn(scriptStyle.replaceAllIn(html0, ""), ""), "")
    // <p> contents are taken verbatim (entities decoded, inner tags
    // stripped, no trim) — this makes extract∘render the identity for
    // ANY input text: render splits on "\n\n" and escapes &<>, so the
    // paragraph bytes inside <p>…</p> are exactly the original bytes.
    val paras = pBlock.findAllMatchIn(html).map { m =>
      unescape(anyTag.replaceAllIn(m.group(1), ""))
    }.toVector
    if (paras.nonEmpty) paras.mkString("\n\n")
    else unescape(anyTag.replaceAllIn(html, " "))
      .split("\\s+").filter(_.nonEmpty).mkString(" ")
  }
}
