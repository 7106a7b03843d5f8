package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stage 4: SHACL-like validation + confidence scoring over the flat
  * triple model — the column-level re-expression of RdfValidator
  * (/root/reference/src/validation.rs:183-298).
  *
  * Per (url, subj) entity:
  *  - required-property rules per Schema.org type (validation.rs:120-160:
  *    Person/Organization/Place/Event require `name`; in the flat model
  *    the name IS the subject surface, so the rule fires only when the
  *    surface is blank) → Error, impact −0.2;
  *  - date-format check on date predicates (validation.rs:258-272,
  *    replicating the weak check: len==10 ∧ '-'@4 ∧ '-'@7) → Warning,
  *    impact −0.05 per bad date property;
  *  - @id URI check (validation.rs:274-287: http:// or https://) →
  *    Warning, impact −0.1;
  *  - confidence starts at 1.0, adds impacts, clamps to [0,1]
  *    (validation.rs:185,290);
  *  - valid ⇔ no Error violations ∧ confidence ≥ min_confidence (0.7)
  *    (validation.rs:293-295).
  */
object Validate {

  val minConfidence = 0.7 // validation.rs:46

  /** Stemmed forms of the date-validated properties
    * (validation.rs:258: birthDate, deathDate, datePublished,
    * dateCreated → birthdat, deathdat, datepublish, datecr...). */
  val dateProps: Seq[String] =
    Seq("birthDate", "deathDate", "datePublished", "dateCreated")
      .map(graft.kernel.Porter.stemPredicate)

  private val typesRequiringName =
    Seq("Person", "Organization", "EducationalOrganization", "Place", "Event", "Airport")

  /** Triples (+ subject iri column name, optional) → per-entity
    * validation frame: url, subj, violations ARRAY<STRUCT>, confidence,
    * valid. */
  def validateEntities(triples: DataFrame, iriCol: Option[String] = None): DataFrame = {
    val isDatePred = col("pred").isin(dateProps: _*)
    val badDate = isDatePred && !(length(col("obj")) === 10 &&
      substring(col("obj"), 5, 1) === "-" && substring(col("obj"), 8, 1) === "-")

    val perTriple = triples.select(
      col("url"), col("subj"), col("subj_type"), col("subj_surface"),
      when(badDate, struct(
        lit("valid_date_format").as("rule"),
        concat(col("pred"), lit(" must be in ISO 8601 format (YYYY-MM-DD)")).as("message"),
        lit("Warning").as("severity"),
        col("pred").as("property"),
        lit(-0.05).as("confidence_impact"))).as("v"),
      iriCol.map(col).getOrElse(lit(null).cast("string")).as("iri"))

    perTriple
      .groupBy(col("url"), col("subj"))
      .agg(
        min(col("subj_type")).as("entity_type"),
        min(col("subj_surface")).as("name"),
        min(col("iri")).as("iri"),
        // one date violation per distinct bad property (reference checks
        // each date property once per document, validation.rs:258)
        array_distinct(collect_list(col("v"))).as("date_violations"))
      .withColumn("name_violation",
        when(col("entity_type").isin(typesRequiringName: _*) &&
          (col("name").isNull || length(trim(col("name"))) === 0),
          array(struct(
            lit("requires_name").as("rule"),
            concat(lit("A "), col("entity_type"),
              lit(" entity must have a 'name' property")).as("message"),
            lit("Error").as("severity"),
            lit("name").as("property"),
            lit(-0.2).as("confidence_impact"))))
          .otherwise(array().cast("array<struct<rule:string,message:string,severity:string,property:string,confidence_impact:double>>")))
      .withColumn("uri_violation",
        when(col("iri").isNotNull &&
          !(col("iri").startsWith("http://") || col("iri").startsWith("https://")),
          array(struct(
            lit("valid_uri").as("rule"),
            lit("@id must be a valid URI").as("message"),
            lit("Warning").as("severity"),
            lit("@id").as("property"),
            lit(-0.1).as("confidence_impact"))))
          .otherwise(array().cast("array<struct<rule:string,message:string,severity:string,property:string,confidence_impact:double>>")))
      .withColumn("violations",
        concat(col("name_violation"), col("date_violations"), col("uri_violation")))
      .withColumn("confidence",
        greatest(lit(0.0), least(lit(1.0),
          lit(1.0) + aggregate(col("violations"), lit(0.0),
            (acc, v) => acc + v.getField("confidence_impact")))))
      .withColumn("valid",
        !exists(col("violations"), v => v.getField("severity") === "Error") &&
          col("confidence") >= minConfidence)
      .drop("date_violations", "name_violation", "uri_violation")
  }

  /** drop_invalid semantics (validation.rs:33-50): split triples into
    * (kept, flagged) by their subject entity's validity. */
  def splitByValidity(triples: DataFrame): (DataFrame, DataFrame) = {
    val verdicts = validateEntities(triples)
      .select(col("url"), col("subj"), col("valid"), col("confidence"))
    val joined = triples.join(verdicts, Seq("url", "subj"))
    (joined.filter(col("valid")), joined.filter(!col("valid")))
  }
}
