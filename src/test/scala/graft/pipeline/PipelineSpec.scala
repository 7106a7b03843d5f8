package graft.pipeline

import graft.SparkTestBase
import graft.kernel.HtmlText

/** End-to-end pipeline gates on the synthesized corpus (SURVEY.md §7.1
  * M2/M3/M6): byte-identity, triple P/R ≥ 0.95 vs gold, linking parity
  * between broadcast and salted strategies. */
class PipelineSpec extends SparkTestBase {

  private val N = 400L

  test("byte-identity: extract_text(html) == text per url (north rule)") {
    import spark.implicits._
    val bad = Corpus.pages(spark, N, 8)
      .map(p => (p.url, HtmlText.extract(p.html) == p.text))
      .filter(!_._2).count()
    assert(bad == 0L)
  }

  test("corpus generation is deterministic across invocations") {
    import spark.implicits._
    val a = Corpus.pages(spark, 50, 4).map(p => (p.url, p.text, p.warc_ts.getTime)).collect().sortBy(_._1)
    val b = Corpus.pages(spark, 50, 2).map(p => (p.url, p.text, p.warc_ts.getTime)).collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("pipeline triples match gold at P/R >= 0.95 (target 1.0)") {
    val pages = Corpus.pages(spark, N, 8)
    val predicted = Kg.pagesToTriples(pages).toDF
    val gold = Corpus.gold(spark, N, 8)
    val m = Eval.prf(predicted, gold)
    info(s"tp=${m.tp} fp=${m.fp} fn=${m.fn} p=${m.precision} r=${m.recall} f1=${m.f1}")
    assert(m.tp > 0)
    assert(m.precision >= 0.95, s"precision ${m.precision}")
    assert(m.recall >= 0.95, s"recall ${m.recall}")
  }

  test("non-english pages are filtered (no gold, no triples)") {
    import spark.implicits._
    val pages = Corpus.pages(spark, N, 8)
    val nonEnUrls = pages.filter(_.lang != "en").map(_.url).collect().toSet
    assert(nonEnUrls.nonEmpty) // ~5% of corpus
    val t = Kg.pagesToTriples(pages)
    assert(t.filter(r => nonEnUrls.contains(r.url)).count() == 0L)
  }

  test("linking: salted shuffle join == broadcast join result") {
    val pages = Corpus.pages(spark, 100, 4)
    val ments = Kg.mentions(Kg.resolve(Kg.chunk(Kg.extractText(pages))))
    val kb = Corpus.kb(spark, nDistractors = 500)
    val a = Linking.linkBroadcast(ments, kb).orderBy("url", "surface")
      .collect().map(_.toSeq).toSeq
    val b = Linking.linkSalted(ments, kb, salts = 8).orderBy("url", "surface")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("linking covers most triple subjects with KB uris; rest minted deterministically") {
    val pages = Corpus.pages(spark, 200, 4)
    val resolved = Kg.resolve(Kg.chunk(Kg.extractText(pages)))
    val trip = Kg.dedup(Kg.triples(resolved))
    val ments = Kg.mentions(resolved)
    val kb = Corpus.kb(spark, nDistractors = 500)
    val linked = Linking.link(ments, kb)
    val enriched = Linking.enrich(trip, linked)
    val (nodes, edges) = Graph.materialize(enriched)
    val total = enriched.count()
    val kbLinked = enriched.filter(enriched("subj_kb_uri").isNotNull).count()
    info(s"triples=$total subjKbLinked=$kbLinked nodes=${nodes.count()} edges=${edges.count()}")
    assert(kbLinked.toDouble / total > 0.95) // world entities are all in the KB
    assert(nodes.count() > 0 && edges.count() > 0)
    // every node IRI unique
    assert(nodes.count() == nodes.select("iri").distinct().count())
  }

  test("J2 fuzzy candidates follow reference CONTAINS semantics (entity_linker.rs:296-312)") {
    import spark.implicits._
    val kb = Seq(
      KbEntry("https://kb.local/e/acme", "The Acme Corporation",
        "the acme corporation", Seq("Organization")),
      KbEntry("https://kb.local/e/francisco", "Francisco", "francisco", Seq("Person")),
      KbEntry("https://kb.local/e/smyth", "John Smyth", "john smyth", Seq("Person"))).toDS()
    val surfaces = Seq("Acme Corporation", "rancisco", "John Smith").toDF("surface")
    val got = Pipeline.linkSurfaces(surfaces, kb, kbCountHint = Some(3L))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // 1. surface sharing a NON-FIRST label token: contained in the label
    //    and JW-similar -> candidate the old first-token blocking missed
    assert(graft.kernel.Jaro.jaroWinkler("the acme corporation", "acme corporation") >= 0.8)
    assert(got.get("Acme Corporation").contains("https://kb.local/e/acme"), got.toString)
    // 2. JW-similar but NOT contained ("john smith" vs "john smyth"):
    //    the reference's CONTAINS pre-filter excludes it, so we must too
    assert(graft.kernel.Jaro.jaroWinkler("john smyth", "john smith") >= 0.8)
    assert(!got.contains("John Smith"), got.toString)
    // 3. PINNED DEVIATION: a mid-token substring ("rancisco" inside
    //    "francisco") IS a reference CONTAINS candidate (character-level
    //    substring, JW 0.96) but token blocking cannot reach it — the
    //    documented miss class of the scalable re-expression
    assert(graft.kernel.Jaro.jaroWinkler("francisco", "rancisco") >= 0.8)
    assert(!got.contains("rancisco"), got.toString)
  }

  test("stage-0 engine switch: none/coref/coreference all run; coref recovers the It-facts") {
    import spark.implicits._
    val chunks = Kg.chunk(Kg.extractText(Corpus.pages(spark, 100, 4)))
    val none = Kg.resolveWith(chunks, "none")
    val coref = Kg.resolveWith(chunks, "coref")
    val second = Kg.resolveWith(chunks, "coreference")
    // none is the identity on text
    val origText = chunks.collect().map(c => (c.url, c.chunk_id) -> c.text).toMap
    assert(none.collect().forall(r => r.resolved_text == origText((r.url, r.chunk_id))))
    assert(none.map(_.mention_map.size).collect().forall(_ == 0))
    // the coref.rs engine resolves the corpus's "It was founded by"
    // pages; the second engine replaces pronouns too (different, cruder
    // antecedents — e.g. the trailing-punctuation quirk)
    val nIt = chunks.filter(_.text.contains("It was founded by")).count()
    assert(nIt > 0)
    assert(coref.filter(_.mention_map.nonEmpty).count() > 0)
    assert(second.filter(_.mention_map.nonEmpty).count() > 0)
    assert(second.filter(_.resolved_text.contains("It was founded by")).count() < nIt)
  }

  test("O6 span provenance: every triple's span slices its sentence out of the resolved chunk") {
    import spark.implicits._
    val pages = Corpus.pages(spark, 150, 4)
    val trip = Kg.pagesToTriples(pages).collect()
    assert(trip.nonEmpty)
    // provenance columns non-null/meaningful for every rule-based triple
    assert(trip.forall(t => t.method == "rule-based" &&
      t.source_text.nonEmpty && t.span_end > t.span_start))
    // recompute each page's resolved chunk texts with the kernel and
    // slice the span back out: substring(span_start, span_end) must be
    // exactly source_text, and source_text must contain the object
    val resolvedByKey = Kg.resolve(Kg.chunk(Kg.extractText(pages)))
      .collect().map(r => (r.url, r.chunk_id) -> r.resolved_text).toMap
    trip.foreach { t =>
      val resolved = resolvedByKey((t.url, t.chunk_id))
      val slice = resolved.substring(t.span_start, t.span_end)
      assert(slice == t.source_text,
        s"span mismatch for ${t.url} chunk ${t.chunk_id}: '$slice' != '${t.source_text}'")
    }
  }

  test("discovery documents: one GLiNER-shape doc per chunk, shuffle-free") {
    val resolved = Kg.resolve(Kg.chunk(Kg.extractText(Corpus.pages(spark, 60, 2))))
    val docs = Pipeline.discoveryDocuments(resolved)
    val plan = docs.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "discovery emission must be narrow")
    val rows = docs.collect()
    assert(rows.length == resolved.count())
    assert(rows.forall(_.getString(2).startsWith("""{"@context":"https://schema.org/"""")))
    // every doc is valid JSON and every entity carries its span metadata
    rows.take(20).foreach { r =>
      val parsed = graft.kernel.JsonParser.parse(r.getString(2))
      assert(parsed.isRight, r.getString(2).take(120))
    }
  }

  test("JSON-LD emission: every document flattens back to exactly its triples") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 100, 4))
    val docs = Pipeline.jsonLdDocuments(trip).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val want = trip.collect().groupBy(_.url)
      .map { case (u, ts) => u -> ts.map(t => (t.subj, t.pred, t.obj)).toSet }
    assert(want.nonEmpty && docs.keySet == want.keySet)
    want.foreach { case (u, triples) =>
      val got = graft.kernel.JsonLd.flatten(docs(u))
        .map(f => (f.subject, f.predicate, f.objectValue)).toSet
      assert(got == triples, s"round-trip mismatch for $u")
    }
    // emitted docs carry the reference @context and Schema.org keys
    assert(docs.values.forall(_.startsWith("""{"@context":"https://schema.org/"""")))
    assert(docs.values.exists(_.contains("\"birthDate\"")))
  }

  test("coref feeds triples: It-pages yield foundedBy facts") {
    import spark.implicits._
    val pages = Corpus.pages(spark, N, 8)
    // gold foundedBy triples exist and are recovered (they only survive
    // via coref resolution on ~half the org pages)
    val gold = Corpus.gold(spark, N, 8).filter(_.pred == "foundedbi")
    assert(gold.count() > 0)
    val got = Kg.pagesToTriples(pages).filter(_.pred == "foundedbi")
    assert(got.count() >= gold.count() * 95 / 100)
  }
}
