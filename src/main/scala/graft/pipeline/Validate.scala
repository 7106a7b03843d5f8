package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stage 4: SHACL-like validation + confidence scoring over the flat
  * triple model — the column-level re-expression of RdfValidator
  * (/root/reference/src/validation.rs:94-318).
  *
  * Per (url, subj) entity, replicating every reference impact constant:
  *  - basic-structure check (validation.rs:185-200: RdfDocument
  *    .validate() fails on missing @context/@type; flat-model analogue:
  *    blank subject or blank entity type) → Error, impact −0.5, and the
  *    reference EARLY-RETURNS with confidence exactly 0.5 and no other
  *    checks run;
  *  - required-property rules (validation.rs:207-231): registered
  *    ValidationRules checked per entity type; `name` is satisfied by
  *    the subject surface (the flat model's name IS the surface), any
  *    other property by a triple with that canonical predicate →
  *    Error, impact −0.2 per missing property;
  *  - ASK-style constraints (validation.rs:233-258: SPARQL ASK via
  *    Oxigraph; offline analogue: a boolean Column predicate over the
  *    per-entity frame), enabled like the reference's
  *    enable_sparql_validation config → Warning, impact −0.15 when the
  *    predicate is false;
  *  - date-format check on date predicates (validation.rs:258-272,
  *    weak check: len==10 ∧ '-'@4 ∧ '-'@7) → Warning, −0.05 per bad
  *    date property;
  *  - @id URI check (validation.rs:274-287: http:// or https://) →
  *    Warning, −0.1;
  *  - confidence starts at 1.0, adds impacts, clamps to [0,1]
  *    (validation.rs:185,290);
  *  - valid ⇔ no Error violations ∧ confidence ≥ min_confidence (0.7)
  *    (validation.rs:293-295).
  */
object Validate {

  val minConfidence = 0.7 // validation.rs:46

  /** A validation rule (validation.rs:22-30). `ask` is the offline
    * analogue of sparql_ask: a predicate built from the per-entity
    * columns (url, subj, entity_type, name, preds ARRAY<STRING>, iri);
    * false ⇒ Warning −0.15. Custom rules register by passing extra
    * instances to validateEntities (validation.rs:441-475 contract). */
  final case class ValidationRule(
      name: String,
      description: String,
      requiredProperties: Seq[String] = Nil,
      entityType: Option[String] = None,
      ask: Option[Column] = None)

  /** The reference's with_schema_org_rules (validation.rs:119-161):
    * Person/Organization/Place/Event require `name` — extended with the
    * two extra entity types of our kernel type system. */
  val schemaOrgRules: Seq[ValidationRule] = Seq(
    ValidationRule("person_requires_name",
      "A Person entity must have a 'name' property",
      Seq("name"), Some("Person")),
    ValidationRule("organization_requires_name",
      "An Organization entity must have a 'name' property",
      Seq("name"), Some("Organization")),
    ValidationRule("place_requires_name",
      "A Place entity must have a 'name' property",
      Seq("name"), Some("Place")),
    ValidationRule("event_requires_name",
      "An Event entity should have a 'name' property",
      Seq("name"), Some("Event")),
    ValidationRule("educational_organization_requires_name",
      "An EducationalOrganization entity must have a 'name' property",
      Seq("name"), Some("EducationalOrganization")),
    ValidationRule("airport_requires_name",
      "An Airport entity must have a 'name' property",
      Seq("name"), Some("Airport")))

  /** Stemmed forms of the date-validated properties
    * (validation.rs:258: birthDate, deathDate, datePublished,
    * dateCreated → birthdat, deathdat, datepublish, datecr...). */
  val dateProps: Seq[String] =
    Seq("birthDate", "deathDate", "datePublished", "dateCreated")
      .map(graft.kernel.Porter.stemPredicate)

  private val violationSchema =
    "array<struct<rule:string,message:string,severity:string,property:string,confidence_impact:double>>"

  private def emptyViolations: Column = array().cast(violationSchema)

  private def violation(rule: Column, message: Column, severity: String,
      property: Column, impact: Double): Column =
    struct(rule.as("rule"), message.as("message"), lit(severity).as("severity"),
      property.as("property"), lit(impact).as("confidence_impact"))

  /** Triples (+ subject iri column name, optional) → per-entity
    * validation frame: url, subj, violations ARRAY<STRUCT>, confidence,
    * valid. `rules` defaults to the Schema.org set; append custom rules
    * to register them; `enableAsk` gates ASK predicates like the
    * reference's enable_sparql_validation. */
  def validateEntities(triples: DataFrame, iriCol: Option[String] = None,
      rules: Seq[ValidationRule] = schemaOrgRules,
      enableAsk: Boolean = false): DataFrame = {
    val isDatePred = col("pred").isin(dateProps: _*)
    val badDate = isDatePred && !(length(col("obj")) === 10 &&
      substring(col("obj"), 5, 1) === "-" && substring(col("obj"), 8, 1) === "-")

    val perTriple = triples.select(
      col("url"), col("subj"), col("subj_type"), col("subj_surface"), col("pred"),
      when(badDate, violation(
        lit("valid_date_format"),
        concat(col("pred"), lit(" must be in ISO 8601 format (YYYY-MM-DD)")),
        "Warning", col("pred"), -0.05)).as("v"),
      iriCol.map(col).getOrElse(lit(null).cast("string")).as("iri"))

    val perEntity = perTriple
      .groupBy(col("url"), col("subj"))
      .agg(
        min(col("subj_type")).as("entity_type"),
        min(col("subj_surface")).as("name"),
        min(col("iri")).as("iri"),
        sort_array(collect_set(col("pred"))).as("preds"),
        // one date violation per distinct bad property (reference checks
        // each date property once per document, validation.rs:258)
        array_distinct(collect_list(col("v"))).as("date_violations"))

    // rule applicability + required-property / ASK violations, built at
    // plan time from the registered rule set
    def applies(r: ValidationRule): Column =
      r.entityType.map(t => col("entity_type") === t).getOrElse(lit(true))
    def hasProp(p: String): Column =
      if (p == "name") col("name").isNotNull && length(trim(col("name"))) > 0
      else array_contains(col("preds"), p)
    val ruleViolations: Column = {
      val perRule = rules.flatMap { r =>
        val required = r.requiredProperties.map { p =>
          when(applies(r) && !hasProp(p),
            array(violation(lit(r.name),
              lit(s"Missing required property '$p': ${r.description}"),
              "Error", lit(p), -0.2)))
            .otherwise(emptyViolations)
        }
        val asked = r.ask.toSeq.map { pred =>
          if (!enableAsk) emptyViolations
          else when(applies(r) && !pred,
            array(violation(lit(r.name),
              lit(s"SPARQL validation failed: ${r.description}"),
              "Warning", lit(null).cast("string"), -0.15)))
            .otherwise(emptyViolations)
        }
        required ++ asked
      }
      if (perRule.isEmpty) emptyViolations else concat(perRule: _*)
    }

    val uriViolation =
      when(col("iri").isNotNull &&
        !(col("iri").startsWith("http://") || col("iri").startsWith("https://")),
        array(violation(lit("valid_uri"), lit("@id must be a valid URI"),
          "Warning", lit("@id"), -0.1)))
        .otherwise(emptyViolations)

    // basic structure (validation.rs:185-200): blank subject or blank
    // type fails immediately — single violation, confidence EXACTLY 0.5
    val structureBroken =
      col("subj").isNull || length(trim(col("subj"))) === 0 ||
        col("entity_type").isNull || length(trim(col("entity_type"))) === 0
    val structureViolations = array(violation(lit("basic_structure"),
      lit("Basic validation failed: missing @type/@context analogue " +
        "(blank subject or entity type)"),
      "Error", lit(null).cast("string"), -0.5))

    perEntity
      .withColumn("violations",
        when(structureBroken, structureViolations)
          .otherwise(concat(col("date_violations").cast(violationSchema),
            ruleViolations, uriViolation)))
      .withColumn("confidence",
        when(structureBroken, lit(0.5)) // early-return semantics
          .otherwise(greatest(lit(0.0), least(lit(1.0),
            lit(1.0) + aggregate(col("violations"), lit(0.0),
              (acc, v) => acc + v.getField("confidence_impact"))))))
      .withColumn("valid",
        !exists(col("violations"), v => v.getField("severity") === "Error") &&
          col("confidence") >= minConfidence)
      .drop("date_violations", "preds")
  }

  /** drop_invalid semantics (validation.rs:33-50): split triples into
    * (kept, flagged) by their subject entity's validity. */
  def splitByValidity(triples: DataFrame): (DataFrame, DataFrame) = {
    val verdicts = validateEntities(triples)
      .select(col("url"), col("subj"), col("valid"), col("confidence"))
    val joined = triples.join(verdicts, Seq("url", "subj"))
    (joined.filter(col("valid")), joined.filter(!col("valid")))
  }

  /** O1 retry-feedback diagnostics — the reference's Instructor-loop
    * error messages (extractor.rs:189-218 generate_validation_error_
    * message) as a deterministic column per entity, completing the
    * validate-or-flag contract: the flagged side now carries the exact
    * human/LLM-readable correction prompt a retry would send. Template
    * choice follows the reference's error taxonomy mapped onto the flat
    * model:
    *  - basic-structure failure (the Missing @type/@context analogue,
    *    types.rs:232-247 → Error::Validation) → "Schema Validation
    *    Error: ..." template;
    *  - missing required property (validation.rs required rules →
    *    Error::MissingField) → "Missing Required Field: ..." template;
    *  - invalid on confidence alone (warnings only) → the generic
    *    "Extraction Error" template; the reference formats the Display
    *    of a nondeterministically-ordered violation here, so the
    *    deterministic analogue reports the violation COUNT.
    * The retry prompt wrapper ("The previous extraction failed with the
    * following error:\n\n{msg}\n\nPlease correct the JSON-LD and
    * extract again from this text:\n\n{text}", extractor.rs:249-252)
    * prepends the chunk text and is assembled at the call site that
    * owns the text column.
    *
    * Output: (url, subj, valid, feedback_rule, feedback); the feedback
    * columns are NULL for valid entities. */
  def retryFeedback(triples: DataFrame,
      rules: Seq[ValidationRule] = schemaOrgRules,
      enableAsk: Boolean = false): DataFrame = {
    val v = validateEntities(triples, rules = rules, enableAsk = enableAsk)
    val errs = filter(col("violations"),
      x => x.getField("severity") === lit("Error"))
    // first Error (rule order is plan-time deterministic); try_ variant:
    // ANSI mode errors on element_at over the empty (warnings-only) array
    val fe = try_element_at(errs, lit(1))
    val schemaSuffix = "\n\nPlease ensure:\n" +
      "- @context is set to \"https://schema.org/\"\n" +
      "- @type is present and valid (Person, Organization, Place, Event, etc.)\n" +
      "- All required properties for the entity type are included\n" +
      "- Property names match Schema.org vocabulary"
    val missingSuffix = "\n\nPlease ensure:\n" +
      "- All required Schema.org properties are present\n" +
      "- Field names are spelled correctly\n" +
      "- Values are not null or empty"
    v.select(col("url"), col("subj"), col("valid"),
      when(col("valid"), lit(null).cast("string"))
        .otherwise(coalesce(fe.getField("rule"), lit("low_confidence")))
        .as("feedback_rule"),
      when(col("valid"), lit(null).cast("string"))
        .when(fe.getField("rule") === "basic_structure",
          concat(lit("Schema Validation Error: "), fe.getField("message"),
            lit(schemaSuffix)))
        .when(fe.isNotNull,
          concat(lit("Missing Required Field: "), fe.getField("property"),
            lit(missingSuffix)))
        .otherwise(concat(lit("Extraction Error: validation failed with "),
          size(col("violations")).cast("string"),
          lit(" warning(s)\n\nPlease try again with valid JSON-LD.")))
        .as("feedback"))
  }
}
