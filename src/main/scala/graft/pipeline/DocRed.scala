package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{PredDict, Slug}

/** DocRED-shaped document-level relation data: coref clusters
  * (`vertexSet`) + relation labels referencing cluster indexes — and the
  * denormalization that resolves them to first-mention names
  * (J9, /root/reference/examples/docred_evaluation.rs:225-327), plus the
  * cross-sentence relation counter (A11, docred_evaluation.rs:380-399).
  */
object DocRed {

  final case class DocMention(name: String, sent_id: Int, mtype: String)
  final case class DocLabel(h: Int, t: Int, r: String)
  final case class DocRedDoc(id: Long, title: String,
      vertexSet: Seq[Seq[DocMention]], labels: Seq[DocLabel])

  /** Deterministic docred-style corpus from the shared entity world:
    * each doc has person/org/place clusters and Wikidata-P labels. */
  def corpus(spark: SparkSession, nDocs: Long): Dataset[DocRedDoc] = {
    import spark.implicits._
    spark.range(0, nDocs, 1, 16).map { id =>
      val rng = new Rng(Corpus.seed ^ (id * 0x2545f4914f6cdd1dL))
      val p = Corpus.personName(rng.nextInt(Corpus.nPersons))
      val o = Corpus.orgName(rng.nextInt(Corpus.nOrgs))
      val (city, country) = Corpus.cityCountry(rng.nextInt(Corpus.cityCountry.length))
      val vertexSet = Seq(
        Seq(DocMention(p, 0, "PER"), DocMention(p.split(" ")(0), 2, "PER")),
        Seq(DocMention(o, 1, "ORG")),
        Seq(DocMention(city, 2, "LOC"), DocMention(city, 3, "LOC")),
        Seq(DocMention(country, 3, "LOC")))
      val labels = Seq(
        DocLabel(0, 1, "P108"), // person worksFor org (cross-sentence)
        DocLabel(0, 2, "P19"), // person birthPlace city (cross-sentence)
        DocLabel(2, 3, "P17")) // city addressCountry country (sent 2 vs 3)
      DocRedDoc(id, p, vertexSet, labels)
    }
  }

  /** First mention of each cluster: element 0 in vector order —
    * exactly `vertexSet[idx].first()` (docred_evaluation.rs:186-191),
    * NOT min-by-sentence. Takes any DataFrame with (id, vertexSet,
    * labels) — the synthetic corpus or the real fixture ingest
    * (sources.DocRedJson), whose id is a string. */
  def firstMentions(docs: DataFrame): DataFrame =
    docs.select(col("id"), posexplode(col("vertexSet")).as(Seq("vidx", "cluster")))
      .select(col("id"), col("vidx"),
        element_at(col("cluster"), 1).getField("name").as("first_name"),
        element_at(col("cluster"), 1).getField("sent_id").as("first_sent"))

  private val dictUdf = udf((r: String) => PredDict.canonical(r))
  private val slugUdf = udf((s: String) => Slug.slug(s))

  /** J9 denormalization: labels joined twice against the first-mention
    * table; subject lower_underscored, predicate dictionary-mapped +
    * stemmed, object verbatim (docred_evaluation.rs:236,262). Labels
    * with unmapped Wikidata ids are dropped (map_wikidata_to_schema
    * returns None → skip). */
  def goldTriples(docs: DataFrame): DataFrame = {
    val fm = firstMentions(docs)
    val labels = docs.select(col("id"), explode(col("labels")).as("l"))
      .select(col("id"), col("l.h").as("h"), col("l.t").as("t"), col("l.r").as("r"))
      .filter(col("r").isin(PredDict.wikidataToSchema.keys.toSeq: _*))
    labels
      .join(fm.select(col("id"), col("vidx").as("h"),
        col("first_name").as("h_name"), col("first_sent").as("h_sent")), Seq("id", "h"))
      .join(fm.select(col("id"), col("vidx").as("t"),
        col("first_name").as("t_name"), col("first_sent").as("t_sent")), Seq("id", "t"))
      .select(col("id"),
        slugUdf(col("h_name")).as("subj"),
        dictUdf(col("r")).as("pred"),
        col("t_name").as("obj"),
        col("h_sent"), col("t_sent"))
  }

  /** A11: relations whose head/tail first mentions live in different
    * sentences (docred_evaluation.rs:380-399). */
  def crossSentenceCounts(docs: DataFrame): DataFrame =
    goldTriples(docs)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_relations"),
        sum(when(col("h_sent") =!= col("t_sent"), 1).otherwise(0)).as("n_cross_sentence"))
}

/** A8/A9: per-case P/R/F1 + aggregate averages
  * (webnlg_evaluation.rs:66-133, integration_tests.rs:34-67). */
object EvalAgg {

  /** Per-url metrics via full-outer join flags, then the A9 aggregate
    * row (avg P/R/F1, totals). Returns (perCase, aggregate). */
  def perCaseAndAggregate(predicted: DataFrame, gold: DataFrame): (DataFrame, DataFrame) = {
    val keys = Seq("url", "subj", "pred", "obj")
    // one-exchange membership flags (see Eval.membershipFlags) — row-
    // identical to distinct-each-side + full-outer join
    val j = Eval.membershipFlags(predicted, gold, keys)
    val perCase = j.groupBy(col("url")).agg(
        sum(when(col("in_pred").isNotNull && col("in_gold").isNotNull, 1).otherwise(0)).as("tp"),
        sum(when(col("in_pred").isNotNull && col("in_gold").isNull, 1).otherwise(0)).as("fp"),
        sum(when(col("in_pred").isNull && col("in_gold").isNotNull, 1).otherwise(0)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, 0.0).otherwise(col("tp") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, 0.0).otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, 0.0)
          .otherwise(lit(2) * col("precision") * col("recall") / (col("precision") + col("recall"))))
    val agg = perCase.agg(
      count(lit(1)).as("n_cases"),
      round(avg(col("precision")), 6).as("avg_precision"),
      round(avg(col("recall")), 6).as("avg_recall"),
      round(avg(col("f1")), 6).as("avg_f1"),
      sum(col("tp")).as("total_tp"), sum(col("fp")).as("total_fp"),
      sum(col("fn")).as("total_fn"))
      // reference quality tiers over the aggregate F1
      // (webnlg_evaluation.rs:310-318)
      .withColumn("quality", Eval.qualityBand(col("avg_f1")))
    (perCase, agg)
  }
}
