package graft.kernel

/** Predicate canonicalization dictionary (north rule: "predicate
  * canonicalization via dictionary mapping").
  *
  * Two layers, mirroring the reference:
  *  1. a raw→Schema.org property dictionary (the Wikidata P-id map of
  *     /root/reference/examples/docred_evaluation.rs:200-222, plus the
  *     surface-verb phrases our pattern extractor emits);
  *  2. Porter stemming of the canonical property
  *     (/root/reference/src/normalize.rs:52-71), e.g. birthDate→birthdat,
  *     location→locat, alumniOf→alumniof.
  */
object PredDict {

  /** Wikidata property id → Schema.org property
    * (docred_evaluation.rs:200-222, verbatim semantics). */
  val wikidataToSchema: Map[String, String] = Map(
    "P17" -> "addressCountry", "P131" -> "containedInPlace",
    "P276" -> "location", "P27" -> "nationality", "P69" -> "alumniOf",
    "P108" -> "worksFor", "P39" -> "jobTitle", "P102" -> "memberOf",
    "P54" -> "memberOf", "P463" -> "memberOf", "P19" -> "birthPlace",
    "P20" -> "deathPlace", "P569" -> "birthDate", "P570" -> "deathDate",
    "P571" -> "foundingDate", "P576" -> "dissolutionDate",
    "P37" -> "language", "P159" -> "location"
  )

  /** Surface-phrase → Schema.org property, used by the pattern extractor
    * (mirrors the system-prompt relation spec at
    * /root/reference/src/extractor.rs:14-117: direction rules and the
    * cityServed→location collapse of tests/fixtures/test_cases.json:43-58). */
  val surfaceToSchema: Map[String, String] = Map(
    "was born on" -> "birthDate",
    "was born in" -> "birthPlace",
    "died on" -> "deathDate",
    "graduated from" -> "alumniOf",
    "works for" -> "worksFor",
    "founded" -> "worksFor", // direction rule: (Person, worksFor, Org)
    "was founded by" -> "foundedBy",
    "is located in" -> "location",
    "is headquartered in" -> "location",
    "serves the city of" -> "location", // cityServed → location
    "is a member of" -> "memberOf",
    "is the capital of" -> "containedInPlace"
  )

  /** Raw-property collapses the reference's extraction spec applies
    * (cityServed → location, extractor.rs:14-117 system prompt +
    * tests/fixtures/test_cases.json:43-58 expected JSON-LD). */
  val rawAliases: Map[String, String] = Map("cityServed" -> "location")

  /** Full canonicalization: dictionary lookup (Wikidata id, raw alias,
    * or raw property) then Porter stem. Unknown predicates are stemmed
    * as-is. */
  def canonical(raw: String): String = {
    val mapped = wikidataToSchema.getOrElse(raw, rawAliases.getOrElse(raw, raw))
    Porter.stemPredicate(mapped)
  }

  /** Inverse map for JSON-LD emission: canonical (stemmed) predicate →
    * the Schema.org property it came from (birthdat → birthDate). Stems
    * are unique over the dictionary (pinned by KernelSpec). Unknown
    * canonicals pass through unchanged. */
  val canonicalToSchema: Map[String, String] =
    (wikidataToSchema.values ++ surfaceToSchema.values).toSeq.distinct
      .map(p => Porter.stemPredicate(p) -> p).toMap

  def schemaProperty(canonicalPred: String): String =
    canonicalToSchema.getOrElse(canonicalPred, canonicalPred)
}
