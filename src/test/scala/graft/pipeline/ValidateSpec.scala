package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Mirrors the reference validator's own tests
  * (/root/reference/src/validation.rs:384-476) in the flat model. */
class ValidateSpec extends SparkTestBase {

  private def trip(url: String, subj: String, pred: String, obj: String,
      subjType: String = "Person", surface: String = "Alan Bean") = {
    TripleRow(url, subj, pred, obj, "", surface, obj_is_entity = false,
      subjType, "", 0, 0, 0.9, "rule-based")
  }

  private def validate(rows: Seq[TripleRow]) = {
    import spark.implicits._
    Validate.validateEntities(rows.toDF)
  }

  test("valid person: no violations, confidence 1.0 (validation.rs:389-405)") {
    val r = validate(Seq(trip("u1", "alan_bean", "birthdat", "1932-03-15"))).head()
    assert(r.getAs[scala.collection.Seq[_]]("violations").isEmpty)
    assert(r.getAs[Double]("confidence") == 1.0)
    assert(r.getAs[Boolean]("valid"))
  }

  test("bad date: warning, still valid, confidence 0.95 (validation.rs:424-439)") {
    val r = validate(Seq(trip("u1", "alan_bean", "birthdat", "32/03/15"))).head()
    val v = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.length == 1)
    assert(v.head.getAs[String]("severity") == "Warning")
    assert(v.head.getAs[String]("rule") == "valid_date_format")
    assert(math.abs(r.getAs[Double]("confidence") - 0.95) < 1e-9)
    assert(r.getAs[Boolean]("valid")) // warning only
  }

  test("missing name: error, invalid (validation.rs:407-422)") {
    val r = validate(Seq(trip("u1", "x", "birthdat", "1932-03-15", surface = ""))).head()
    val v = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.exists(_.getAs[String]("severity") == "Error"))
    assert(!r.getAs[Boolean]("valid"))
    assert(math.abs(r.getAs[Double]("confidence") - 0.8) < 1e-9)
  }

  test("two bad dates on one entity: one violation each, -0.05 apiece") {
    val r = validate(Seq(
      trip("u1", "alan_bean", "birthdat", "bad"),
      trip("u1", "alan_bean", "deathdat", "also-bad-x"))).head()
    assert(r.getAs[scala.collection.Seq[_]]("violations").length == 2)
    assert(math.abs(r.getAs[Double]("confidence") - 0.9) < 1e-9)
  }

  test("weak date check passes abcd-ef-gh (parity with validation.rs:326-333)") {
    val r = validate(Seq(trip("u1", "alan_bean", "birthdat", "abcd-ef-gh"))).head()
    assert(r.getAs[scala.collection.Seq[_]]("violations").isEmpty) // weak check on purpose
  }

  test("structure violation: blank entity type fails hard at confidence exactly 0.5") {
    // validation.rs:185-200: document.validate() failure early-returns
    // with the single basic_structure Error and confidence 0.5
    val r = validate(Seq(
      trip("u1", "acme", "locat", "Lyon", subjType = "", surface = ""))).head()
    val v = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.length == 1) // early return: no other checks ran
    assert(v.head.getAs[String]("rule") == "basic_structure")
    assert(v.head.getAs[String]("severity") == "Error")
    assert(v.head.getAs[Double]("confidence_impact") == -0.5)
    assert(r.getAs[Double]("confidence") == 0.5)
    assert(!r.getAs[Boolean]("valid"))
  }

  test("custom rule registration: required property fires Error (validation.rs:441-475)") {
    import spark.implicits._
    val rule = Validate.ValidationRule("test_rule", "Test requires foo",
      requiredProperties = Seq("foo"))
    val rows = Seq(trip("u1", "thing_x", "locat", "Lyon", subjType = "Thing",
      surface = "Thing X"))
    val r = Validate.validateEntities(rows.toDF,
      rules = Validate.schemaOrgRules :+ rule).head()
    val v = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.exists(x => x.getAs[String]("rule") == "test_rule" &&
      x.getAs[String]("severity") == "Error" &&
      x.getAs[Double]("confidence_impact") == -0.2))
    assert(!r.getAs[Boolean]("valid"))
    // satisfied when a triple carries the canonical predicate
    val ok = Validate.validateEntities(
      Seq(trip("u1", "thing_x", "foo", "bar", subjType = "Thing",
        surface = "Thing X")).toDF,
      rules = Validate.schemaOrgRules :+ rule).head()
    assert(ok.getAs[Boolean]("valid"))
  }

  test("ASK-style constraint: -0.15 Warning when predicate false, gated by enableAsk") {
    import spark.implicits._
    // ask analogue of validation.rs:233-258: person entities must carry
    // a birth date triple
    val rule = Validate.ValidationRule("person_has_birthdate",
      "Person should state a birthDate",
      entityType = Some("Person"),
      ask = Some(array_contains(col("preds"), "birthdat")))
    val rows = Seq(trip("u1", "alan_bean", "locat", "Lyon"))
    val fired = Validate.validateEntities(rows.toDF,
      rules = Validate.schemaOrgRules :+ rule, enableAsk = true).head()
    val v = fired.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.exists(x => x.getAs[String]("rule") == "person_has_birthdate" &&
      x.getAs[String]("severity") == "Warning" &&
      x.getAs[Double]("confidence_impact") == -0.15))
    assert(math.abs(fired.getAs[Double]("confidence") - 0.85) < 1e-9)
    assert(fired.getAs[Boolean]("valid")) // warning only
    // disabled (the reference's enable_sparql_validation=false default)
    val off = Validate.validateEntities(rows.toDF,
      rules = Validate.schemaOrgRules :+ rule, enableAsk = false).head()
    assert(off.getAs[scala.collection.Seq[_]]("violations").isEmpty)
    // satisfied predicate fires nothing
    val sat = Validate.validateEntities(
      Seq(trip("u1", "alan_bean", "birthdat", "1932-03-15")).toDF,
      rules = Validate.schemaOrgRules :+ rule, enableAsk = true).head()
    assert(sat.getAs[scala.collection.Seq[_]]("violations").isEmpty)
  }

  test("every reference impact constant fires: -0.5 -0.2 -0.15 -0.1 -0.05") {
    import spark.implicits._
    // -0.1 valid_uri needs an iri column
    val rows = Seq(trip("u1", "alan_bean", "birthdat", "1932-03-15"))
      .toDF.withColumn("iri", lit("not-a-uri"))
    val r = Validate.validateEntities(rows, iriCol = Some("iri")).head()
    val v = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("violations")
    assert(v.map(_.getAs[Double]("confidence_impact")) == Seq(-0.1))
    assert(math.abs(r.getAs[Double]("confidence") - 0.9) < 1e-9)
    // impacts covered across the suite: -0.5 (structure test), -0.2
    // (missing name / custom rule), -0.15 (ask), -0.1 (here), -0.05
    // (bad date) — this assertion just documents the full set
    assert(Seq(-0.5, -0.2, -0.15, -0.1, -0.05).forall(_ < 0))
  }

  test("O1 retry feedback: every template branch fires (extractor.rs:189-218)") {
    import spark.implicits._
    val rows = Seq(
      trip("u1", "ok", "birthdat", "1932-03-15"),                   // valid -> NULL
      trip("u2", "broken", "worksfor", "Acme", subjType = ""),      // structure
      trip("u3", "noname", "birthdat", "1932-03-15", surface = ""), // missing name
      trip("u4", "dates", "birthdat", "bad1"),
      trip("u4", "dates", "deathdat", "bad2"),
      trip("u4", "dates", "datepublish", "bad3"))
    val fb = Validate.retryFeedback(rows.toDF)
      .collect().map(r => r.getString(1) ->
        (r.getBoolean(2), Option(r.getString(3)), Option(r.getString(4)))).toMap
    assert(fb("ok") == ((true, None, None)))
    val (bValid, bRule, bMsg) = fb("broken")
    assert(!bValid && bRule.contains("basic_structure"))
    assert(bMsg.get.startsWith("Schema Validation Error: Basic validation failed"))
    assert(bMsg.get.contains("@context is set to \"https://schema.org/\""))
    val (nValid, nRule, nMsg) = fb("noname")
    assert(!nValid && nRule.contains("person_requires_name"))
    assert(nMsg.get == "Missing Required Field: name\n\nPlease ensure:\n" +
      "- All required Schema.org properties are present\n" +
      "- Field names are spelled correctly\n" +
      "- Values are not null or empty")
    // 3 bad dates: 0.85 confidence, warnings only -> still VALID (no feedback)
    assert(fb("dates") == ((true, None, None)))
  }

  test("O1 retry feedback: low-confidence generic branch (warning-only invalid)") {
    import spark.implicits._
    // three ASK-style warnings (-0.15 each) + a bad date (-0.05) ->
    // confidence 0.50 < 0.7 with NO Error violations -> generic template
    val asks = (1 to 3).map(i => Validate.ValidationRule(s"ask$i", s"check $i",
      Nil, Some("Person"), Some(lit(false))))
    val fb = Validate.retryFeedback(
      Seq(trip("u1", "e", "birthdat", "not-a-date-x")).toDF,
      rules = Validate.schemaOrgRules ++ asks, enableAsk = true).head()
    assert(!fb.getBoolean(2))
    assert(fb.getString(3) == "low_confidence")
    assert(fb.getString(4) == "Extraction Error: validation failed with 4 warning(s)" +
      "\n\nPlease try again with valid JSON-LD.")
  }

  test("splitByValidity drops triples of invalid entities only") {
    import spark.implicits._
    val rows = Seq(
      trip("u1", "good", "birthdat", "1932-03-15"),
      trip("u1", "bad", "birthdat", "1932-03-15", surface = ""))
    val (kept, flagged) = Validate.splitByValidity(rows.toDF)
    assert(kept.select("subj").collect().map(_.getString(0)).toSeq == Seq("good"))
    assert(flagged.select("subj").collect().map(_.getString(0)).toSeq == Seq("bad"))
  }
}
