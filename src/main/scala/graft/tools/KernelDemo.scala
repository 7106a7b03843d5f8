package graft.tools

import graft.kernel._

/** Dev driver: run the pure kernel end-to-end on a real document
  * (no Spark). Usage: sbt "runMain graft.tools.KernelDemo <textfile>"
  * or with no args, a built-in sample. */
object KernelDemo {
  def main(args: Array[String]): Unit = {
    val text =
      if (args.nonEmpty)
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
      else
        "Alan Bean was born on the 15th of March 1932. Alan Bean graduated from UT Austin. " +
          "Acme Corp is located in Lyon. It was founded by Dan Shalev."

    // html round-trip (P14 spec invariant)
    val html = HtmlText.render("demo", text, "en")
    val rt = HtmlText.extract(html)
    println(s"[html] bytes=${html.length} roundTripIdentical=${rt == text}")

    // chunking (T1)
    val chunks = Chunker.default.chunk(text)
    println(s"[chunk] n=${chunks.length} sizes=${chunks.map(_.text.length).take(8).mkString(",")}")

    // coref (stage 0)
    val t0 = System.nanoTime()
    val resolvedChunks = chunks.map(c => Coref.resolve(c.text))
    val corefMs = (System.nanoTime() - t0) / 1e6
    val nMapped = resolvedChunks.map(_.mentionMap.size).sum
    println(f"[coref] chunks=${chunks.length} mentionMapEntries=$nMapped coref_ms=$corefMs%.1f")

    // mentions (T3 analogue) + relations (stage 2 analogue)
    val mentions = resolvedChunks.flatMap(r => Relations.mentions(r.resolvedText))
    val rels = resolvedChunks.flatMap(r => Relations.extract(r.resolvedText))
    println(s"[mentions] n=${mentions.length} sampleTypes=" +
      mentions.groupBy(_.entityType).map { case (k, v) => s"$k:${v.size}" }.toSeq.sorted.mkString(","))

    val triples = rels
      .map(r => (Slug.slug(r.subj), PredDict.canonical(r.pred), r.obj))
      .filterNot { case (_, p, _) => Relations.likelyIncorrect(p) }
      .distinct
    println(s"[triples] n=${triples.length}")
    triples.take(15).foreach { case (s, p, o) => println(s"  ($s, $p, $o)") }
  }
}
