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
