package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan gates: the properties that make the 100 TB story true
  * must be visible in `.explain`, not just intended (builder prompt:
  * "iterate until it's the plan you'd want"). */
class PlanSpec extends SparkTestBase {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }

  test("parquet scan: filters and projection push down to the reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_plan").toString
    Corpus.pages(spark, 100, 4).write.parquet(s"$dir/pages")
    val df = spark.read.parquet(s"$dir/pages")
      .filter(col("lang") === "en").select("url", "lang")
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), plan)
    assert(plan.contains("ReadSchema: struct<url:string,lang:string>"), plan)
  }

  test("KB linking joins are broadcast, never shuffled large-side or cartesian") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 100, 4))
    val (nodes, edges) = Pipeline.graphFromTriples(trip, Corpus.kb(spark, 500))
    val plan = executedPlan(edges)
    assert(plan.contains("BroadcastHashJoin"), "edges join-back should broadcast")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
    assert(!plan.contains("SortMergeJoin"),
      "vocabulary join-back must not shuffle the triples table")
  }

  test("whole-stage codegen covers the relational ops queries") {
    val df = graft.SparkEntry.queries("q_agg_group")(spark, "/root/testdata/sf0.001")
    df.collect() // AQE: codegen spans appear in the FINAL executed plan
    val plan = executedPlan(df)
    assert(plan.contains("*("), "expected WholeStageCodegen spans\n" + plan.take(1500))
  }

  test("pages→triples extraction is completely shuffle-free (dedup is in-row)") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 50, 2))
    val plan = trip.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "extraction must not shuffle:\n" + plan.take(1000))
  }

  test("operator-form dedup still combines map-side (partial min_by before exchange)") {
    val trip = Kg.extractTriplesFused(Corpus.pages(spark, 50, 2))
    val plan = Kg.dedup(trip).queryExecution.executedPlan.toString
    // min_by over a struct value falls back to SortAggregate, but the
    // partial aggregate still runs before the exchange (map-side combine)
    assert(plan.contains("partial_min_by"), plan.take(800))
    assert(plan.indexOf("partial_min_by") > plan.indexOf("Exchange"),
      "partial agg should be below (before) the exchange in the plan tree")
  }

  test("forced large-vocab tier: join-back shuffles with salt, no vocab broadcast") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 100, 4))
    val (_, edges) = Pipeline.graphFromTriples(trip, Corpus.kb(spark, 500),
      broadcastVocabLimit = 0L) // force the open-vocabulary path
    val plan = executedPlan(edges)
    assert(!plan.contains("CartesianProduct"))
    // the triple-side join keys must carry the salt (crc32 % S)
    assert(plan.contains("crc32"), "salt term missing from the shuffle join-back:\n" + plan.take(1200))
    // the vocabulary must be exploded across salts, not broadcast into the join
    assert(plan.contains("explode"), "vocab side should replicate across salts")
  }

  test("size-tiered join-back: both tiers produce identical edges") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 120, 4))
    val kb = Corpus.kb(spark, 500)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("url", "src_iri", "pred", "dst_iri", "obj_literal")
        .collect().map(_.toSeq).toSeq
    val (nB, eB) = Pipeline.graphFromTriples(trip, kb)
    val (nS, eS) = Pipeline.graphFromTriples(trip, kb, broadcastVocabLimit = 0L)
    assert(sorted(eB) == sorted(eS))
    assert(nB.orderBy("iri").collect().map(_.toSeq).toSeq ==
      nS.orderBy("iri").collect().map(_.toSeq).toSeq)
    assert(eB.count() > 0)
  }

  test("entityProps: map-side partial aggregate, single exchange") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 50, 2)).toDF
    val plan = executedPlan(Kg.entityProps(trip))
    assert("Exchange".r.findAllIn(plan.replace("BroadcastExchange", "")).length == 1,
      "A3 last-write rollup should shuffle exactly once:\n" + plan.take(800))
    assert(plan.contains("partial_max_by"), plan.take(800))
    assert(plan.indexOf("partial_max_by") > plan.indexOf("Exchange"),
      "partial agg should run before the exchange")
  }

  test("jsonLdDocuments: exactly one shuffle (the url group), then per-group assembly") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 50, 2))
    val plan = executedPlan(Pipeline.jsonLdDocuments(trip))
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(800))
    assert(plan.contains("MapGroups"), plan.take(800))
  }

  test("linkSurfaces: broadcast joins, top-1 window gets the group-limit pushdown") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 100, 4)).toDF
    val surfaces = trip.select(col("subj_surface").as("surface"))
      .unionByName(trip.filter(col("obj_is_entity")).select(col("obj").as("surface")))
      .distinct()
    val df = Pipeline.linkSurfaces(surfaces, Corpus.kb(spark, 500))
    df.collect() // AQE final plan
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin"), "KB joins must broadcast at this scale")
    assert(plan.contains("WindowGroupLimit"),
      "top-1 per surface should push the rank limit below the window:\n" + plan.take(1000))
  }

  test("forced large-KB tier: linking never broadcasts the KB, fuzzy join is salted") {
    // kill every auto-broadcast path so the plan shows the honest large-KB shape
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val trip = Kg.pagesToTriples(Corpus.pages(spark, 100, 4)).toDF
      val surfaces = trip.select(col("subj_surface").as("surface"))
        .unionByName(trip.filter(col("obj_is_entity")).select(col("obj").as("surface")))
        .distinct()
      val df = Pipeline.linkSurfaces(surfaces, Corpus.kb(spark, 500),
        broadcastKbLimit = 0L) // force the huge-KB path
      df.collect() // AQE final plan
      val plan = executedPlan(df)
      assert(!plan.contains("BroadcastExchange"),
        "large-KB tier must not broadcast the KB:\n" + plan.take(1500))
      assert(!plan.contains("CartesianProduct"))
      // the fuzzy blocked join must carry the salt key and the replicated
      // (exploded) miss side. (The pmod(hash) salt itself gets
      // constant-folded into the LocalTableScan at this KB size — the
      // tiny test KB is a LocalRelation — so gate on the join keys.)
      assert(plan.contains("salt#"), "salt key missing from the fuzzy join:\n" + plan.take(1500))
      assert(plan.contains("explode"), "miss side should replicate across salts")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("size-tiered KB linking: both tiers produce identical links and graphs") {
    val trip = Kg.pagesToTriples(Corpus.pages(spark, 120, 4))
    val kb = Corpus.kb(spark, 500)
    val surfaces = trip.toDF.select(col("subj_surface").as("surface"))
      .unionByName(trip.toDF.filter(col("obj_is_entity")).select(col("obj").as("surface")))
      .distinct()
    def sortedL(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("surface", "uri").collect().map(_.toSeq).toSeq
    val lB = Pipeline.linkSurfaces(surfaces, kb)
    val lS = Pipeline.linkSurfaces(surfaces, kb, broadcastKbLimit = 0L)
    assert(sortedL(lB) == sortedL(lS))
    assert(lB.count() > 0)
    // and end-to-end through graphFromTriples
    def sortedE(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("url", "src_iri", "pred", "dst_iri", "obj_literal")
        .collect().map(_.toSeq).toSeq
    val (nB, eB) = Pipeline.graphFromTriples(trip, kb)
    val (nS, eS) = Pipeline.graphFromTriples(trip, kb, broadcastKbLimit = 0L)
    assert(sortedE(eB) == sortedE(eS))
    assert(nB.orderBy("iri").collect().map(_.toSeq).toSeq ==
      nS.orderBy("iri").collect().map(_.toSeq).toSeq)
  }

  test("size-tiered operator-form link: tiers identical, large tier salts the KB") {
    import spark.implicits._
    val ments = (0 until 300).map(i =>
      MentionRow(s"https://d${i % 40}.example.org/p$i", 0,
        if (i % 3 == 0) "Acme Corp" else if (i % 3 == 1) "Acme Crop" else s"Entity $i",
        "Organization", 0, 9, 0.9)).toDS
    val kb = Corpus.kb(spark, 200)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("url", "surface", "uri").collect().map(_.toSeq).toSeq
    val b = Linking.link(ments, kb)
    val s = Linking.link(ments, kb, broadcastKbLimit = 0L)
    assert(sorted(b) == sorted(s))
    assert(b.count() > 0)
  }

  test("jwSimilarityJoin plans a hash join on the length bucket, never a cartesian") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"name$i")).toDF("id", "s")
    val plan = executedPlan(graft.ops.Dedup.jwSimilarityJoin(d, "id", "s", 0.9))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "JW join must not go quadratic:\n" + plan.take(800))
  }

  test("jwContainsJoin plans equi-joins on the token block, never a cartesian") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"acme systems ${i % 9}")).toDF("id", "s")
    val plan = executedPlan(graft.ops.Dedup.jwContainsJoin(d, "id", "s", 0.9))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "contains-JW join must not go quadratic:\n" + plan.take(800))
  }

  test("JDK codec decodes are shuffle-free narrow scans (image, video, audio)") {
    import graft.ops.Multimodal
    val img = Multimodal.codecImages(spark, 20, "png")
    val pImg = executedPlan(Multimodal.jdkChannelMeans(img))
    assert(!pImg.contains("Exchange"), "image decode must not shuffle:\n" + pImg.take(800))
    val vid = Multimodal.gifVideos(spark, 10)
    val pVid = executedPlan(Multimodal.gifFrameSample(vid, 2))
    assert(!pVid.contains("Exchange"), "video frame sample must not shuffle:\n" + pVid.take(800))
    val wav = Multimodal.wavAudios(spark, 10)
    val pWav = executedPlan(Multimodal.wavDecodeStats(wav))
    assert(!pWav.contains("Exchange"), "audio decode must not shuffle:\n" + pWav.take(800))
  }

  test("repetitionFeatures: shuffle-free narrow kernel scan") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"a b c $i. d e f")).toDF("doc_id", "text")
    val plan = executedPlan(graft.ops.TextAnalysis.repetitionFeatures(d, "doc_id", "text"))
    assert(!plan.contains("Exchange"), "repetition features must not shuffle:\n" + plan.take(800))
  }

  test("lineDedup: exactly one exchange (the line-key window)") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"shared line. unique $i")).toDF("doc_id", "text")
    val df = graft.ops.TextAnalysis.lineDedup(d, "doc_id", "text")
    df.collect()
    val plan = executedPlan(df)
    assert("Exchange".r.findAllIn(plan.replace("BroadcastExchange", "")
      .replace("AQEShuffleRead", "")).length <= 2, // AQE may split final plan/initial
      "line dedup should shuffle once on the line key:\n" + plan.take(1200))
    assert(!plan.contains("SinglePartition"), "no global single-reducer anywhere")
  }

  test("sessionStats: the one user-key exchange serves windows AND rollup") {
    import spark.implicits._
    val d = (1L to 100L).map(i =>
      (i, i % 7, new java.sql.Timestamp(i * 1000000L), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val df = graft.ops.Events.sessionStats(d, "user_id", "event_id", "ts",
      "value", 3600L)
    df.collect()
    val plan = executedPlan(df)
    // the rollup's grouping keys are a superset of the window
    // partitioning — it must REUSE the session shuffle, never add an
    // exchange keyed on (user, session_idx)
    assert(!plan.contains("session_idx") ||
      !"Exchange hashpartitioning\\([^)]*session_idx".r.findFirstIn(plan).isDefined,
      "rollup must not reshuffle on (user, session_idx):\n" + plan.take(1200))
    assert("Exchange".r.findAllIn(plan.replace("BroadcastExchange", "")
      .replace("AQEShuffleRead", "")).length <= 2, // AQE may print initial+final
      "sessionStats should shuffle once on the user key:\n" + plan.take(1200))
    assert(!plan.contains("SinglePartition"), "no global single-reducer anywhere")
  }

  test("funnel: one key exchange, no per-step joins, no single partition") {
    import spark.implicits._
    val d = (1L to 300L).map(i =>
      (i, i % 11, new java.sql.Timestamp(i * 1000000L),
        Seq("view", "click", "purchase", "error")((i % 4).toInt)))
      .toDF("event_id", "user_id", "ts", "event_type")
    val df = graft.ops.Events.funnel(d, "user_id", "event_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
    df.collect()
    val plan = executedPlan(df)
    assert(!plan.contains("Join"), "funnel must not plan per-step joins:\n" + plan.take(1200))
    assert("Exchange".r.findAllIn(plan.replace("AQEShuffleRead", "")).length <= 2,
      "one key shuffle (AQE may print initial+final):\n" + plan.take(1200))
    assert(!plan.contains("SinglePartition"), "no global single-reducer")
  }

  test("semDedup: cluster-keyed equi-joins only, never a cartesian") {
    import spark.implicits._
    val rng = new Rng(61L)
    val d = (0L until 100L).map(i =>
      (i, Array.fill(64)((rng.nextDouble() - 0.5).toFloat))).toDF("vec_id", "embedding")
    val cents = Array.tabulate(4)(graft.ops.Similarity.ivfCentroid(_, 64))
    val df = graft.ops.Similarity.semDedup(d, cents, 0.95)
    df.collect()
    val plan = executedPlan(df)
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere:\n" + plan.take(1200))
    assert(plan.contains("BroadcastHashJoin"),
      "cluster counts and the drop set should broadcast:\n" + plan.take(1200))
  }

  test("packSequences: windows are span-partitioned, never a global single partition") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val df = graft.ops.TextAnalysis.packSequences(d, "doc_id", "text", budget = 16L, parts = 8)
    df.collect()
    val plan = executedPlan(df)
    assert(plan.contains("Window"), plan.take(600))
    assert(!plan.contains("SinglePartition"),
      "the prefix sum must be span-partitioned, not a global-order window:\n" + plan.take(1200))
  }

  test("sampleByTokenBudget: corpus window is (source, span)-partitioned, never source alone") {
    import spark.implicits._
    val d = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) "web" else "books", 100L)).toDF("doc_id", "source", "n_chars")
    val df = graft.ops.TextAnalysis.sampleByTokenBudget(d, "source", "doc_id",
      col("n_chars") / lit(4), budget = 100L)
    df.collect()
    val plan = executedPlan(df)
    // the window that runs over the CORPUS orders by the md5 key
    // (__key); its spec must carry the __span range-bucket in the
    // partition list — a source-alone partition is the one-reducer-
    // per-Zipfian-source plan VERDICT r05 #1 flagged. (The prefix
    // window over the sources×256 totals table has no __key order.)
    val specs = """windowspecdefinition\(([^()]*)""".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    val corpusSpecs = specs.filter(_.contains("__key"))
    assert(corpusSpecs.nonEmpty, "expected the corpus-ordered window:\n" + plan.take(1200))
    corpusSpecs.foreach(s => assert(s.contains("__span"),
      s"corpus window must be span-partitioned, got: $s"))
    // and the exchange feeding it is keyed (source, __span)
    val parts = """hashpartitioning\(([^()]*)""".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(parts.exists(p => p.contains("source") && p.contains("__span")),
      "expected a (source, __span) exchange:\n" + parts.mkString("; "))
  }

  test("as-of and range joins: hash joins / one window, never a cross-join") {
    import spark.implicits._
    import java.sql.Timestamp
    val n = 500
    val ev = (0 until n).map(i =>
      (i.toLong, (i % 17).toLong, new Timestamp(1700000000000L + i * 7000L), i * 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val rj = graft.ops.AsOf.temporalNeighbors(ev, "user_id", "event_id", "ts", 300L)
    rj.collect()
    val rjPlan = executedPlan(rj)
    assert(!rjPlan.contains("CartesianProduct") && !rjPlan.contains("BroadcastNestedLoopJoin"),
      "range join must stay an equi-join:\n" + rjPlan.take(1000))
    val aj = graft.ops.AsOf.asofJoin(
      ev.select("event_id", "user_id", "ts"),
      ev.select("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", Seq("value"))
    aj.collect()
    val ajPlan = executedPlan(aj)
    assert(!ajPlan.contains("CartesianProduct") && !ajPlan.contains("BroadcastNestedLoopJoin"),
      "as-of join must not cross-join:\n" + ajPlan.take(1000))
    assert(ajPlan.contains("Window"), "as-of join is one ordered window")
  }

  test("salted join variant spreads one hot key across all salts") {
    import spark.implicits._
    // one very hot mention key joined against the KB
    val hot = (0 until 2000).map(i =>
      MentionRow(s"https://d$i.example.org/x", 0, "Acme Corp", "Organization", 0, 9, 0.9))
    val ments = hot.toDS
    val df = Linking.linkSalted(ments, Corpus.kb(spark, 100), salts = 8)
    // correctness: every url still links
    assert(df.count() == 2000)
    val plan = executedPlan(df)
    assert(plan.contains("pmod") || plan.toLowerCase.contains("salt"),
      "salt term must appear in the physical plan")
  }
}
