package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Second coref engine goldens — replicating the reference's own tests
  * (/root/reference/src/coreference.rs:470-504) plus its documented
  * quirks, bug-for-bug. */
class CoreferenceSpec extends AnyFunSuite {

  test("reference test_rule_based_resolver: 'He' after Dan Shalev resolves") {
    // coreference.rs:489-503
    val text = "Dan Shalev founded the company. He is the CEO."
    val r = Coreference.resolve(text)
    assert(r.clusters.nonEmpty)
    // "He" -> last capitalized 3+-char word before it = "Shalev" (with
    // no punctuation attached here)
    assert(r.clusters.exists(c => c.mentions.head.text == "He" && c.canonical == "Shalev"))
    assert(r.resolvedText.contains("Shalev is the CEO."))
    assert(r.clusters.forall(_.confidence == 0.6f))
    assert(r.clusters.forall(_.canonicalOffset == 0))
  }

  test("no mentions -> text unchanged (reference test_noop shape)") {
    val text = "Alan Bean founded Acme."
    val r = Coreference.resolve(text)
    assert(r.resolvedText == text && r.clusters.isEmpty && r.offsetToCanonical.isEmpty)
  }

  test("quirk: punctuation-attached pronouns are NOT detected") {
    // detect_mentions compares the whole whitespace word: "him." is not
    // in the pronoun list (coreference.rs:293-313)
    assert(Coreference.detectMentions("Mary praised him.").isEmpty)
    assert(Coreference.detectMentions("Mary praised him today").nonEmpty)
  }

  test("quirk: antecedent keeps attached punctuation and skips the stop list") {
    // last capitalized word is "Shalev," WITH the comma
    val ant = Coreference.findAntecedent("Dan Shalev, the founder, spoke and he ", 38)
    assert(ant.contains("Shalev,"))
    // The/A/An/This never match; 1-2 char capitals skipped
    assert(Coreference.findAntecedent("The AB he ", 7).isEmpty)
  }

  test("quirk: offsets drift after multi-space runs (len+1 accumulation)") {
    // "Alan  Bean" (two spaces): scan offset of "he" is one short of its
    // true position — replicating coreference.rs:296-303
    val text = "Alan  Bean spoke and he left"
    val m = Coreference.detectMentions(text).head
    assert(m.text == "he")
    assert(m.start == text.indexOf("he ") - 1) // drifted by the extra space
  }

  test("reverse-order replacement resolves multiple pronouns against original offsets") {
    val text = "Maria Curie won twice and she said they cheered"
    val r = Coreference.resolve(text)
    // "she" -> Curie; "they" -> last capitalized word before it in the
    // ORIGINAL text (still Curie — "she" is lowercase)
    assert(r.resolvedText == "Maria Curie won twice and Curie said Curie cheered")
    assert(r.offsetToCanonical.values.toSet == Set("Curie"))
  }

  test("engine switch: Kg.resolveWith strategies agree on pronoun-free text") {
    // pure-kernel check of the adapter shape
    val (t, m) = Coreference.asCorefResult("Acme Corp is located in Lyon.")
    assert(t == "Acme Corp is located in Lyon." && m.isEmpty)
  }
}
