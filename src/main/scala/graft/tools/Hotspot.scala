package graft.tools
import graft.kernel._
import graft.pipeline.Corpus
object Hotspot {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val pages = (0 until n).map(i => Corpus.genPage(i.toLong)._1)
    def time[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"[hs] $l: ${(System.nanoTime()-t0)/1e6}%.0f ms"); r }
    (1 to 2).foreach { round =>
      println(s"[hs] round $round  (n=$n)")
      time("genPage") { (0 until n).foreach(i => Corpus.genPage(i.toLong)) }
      val texts = time("extract(html)") { pages.map(p => HtmlText.extract(p.html)) }
      val chunks = time("chunk") { texts.map(t => if (Chunker.estimateTokens(t) < 2000) Vector(t) else Chunker.default.chunk(t).map(_.text)) }
      val resolved = time("coref") { chunks.map(_.map(c => Coref.resolve(c).resolvedText)) }
      val rels = time("relations") { resolved.map(_.flatMap(Relations.extract)) }
      time("normalize") { rels.foreach(_.foreach(r => (Slug.slug(r.subj), PredDict.canonical(r.pred)))) }
    }
  }
}
