package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Naming convention: `kg_*` = the KG-construction pipeline over the
  * synthesized page corpus (FIXTURES.md §B2); `q_*` = relational/text
  * operators over the driver-provided parquet tables. EVERY query —
  * kg_* and q_* alike — carries a DuckDB oracle in `oracleSql`
  * (kg_* oracles re-derive the pipeline stages in SQL over the
  * kernel-intermediate parquet Verify dumps to `<outDir>__inputs`,
  * referenced via the {OUT} placeholder).
  */
object SparkEntry {

  /** Pages to synthesize for kg_* queries, scaled by the sf dir. */
  def pagesFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 40000L
    else if (sfDir.contains("sf0.01")) 8000L
    else 2000L

  /** Fake images to synthesize for q_multimodal_*, scaled by sf dir. */
  def imagesFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 20000L
    else if (sfDir.contains("sf0.01")) 5000L
    else 1000L

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // --- per-JVM checkpoint of the fused NLP pass -------------------------
  // The flagship architecture is "extract once, query many": the triples
  // table is a parquet CHECKPOINT (Pipeline.graphCheckpointed's resume
  // boundary) and every downstream query reads the file. The kg_*
  // queries follow the same contract here: the first query that needs
  // the extraction (or the resolved-chunk table) writes it under a
  // JVM-unique temp dir; the rest read parquet. Results are identical
  // to recomputation (the kernel is deterministic and parquet
  // round-trips exactly); the JVM-unique token means a stale checkpoint
  // from an older build can never leak in.
  private lazy val ckDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_entry_ck")
    p.toFile.deleteOnExit()
    p.toString
  }
  // Per-KEY memoized builds: a FutureTask per key means concurrent
  // callers of the SAME key share one write (second caller blocks on
  // get()), while DIFFERENT keys build fully in parallel — the warmup
  // overlaps independent checkpoint builds from a thread pool (guide
  // §2.6: back-fill the tail of one job with the next), which a single
  // map-wide lock would serialize.
  private val ckDone = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.FutureTask[String]]()
  private def checkpointed(s: SparkSession, key: String)(make: => DataFrame): DataFrame = {
    val task = new java.util.concurrent.FutureTask[String](() => {
      val p = s"$ckDir/$key"
      make.write.mode("overwrite").parquet(p)
      p
    })
    val prev = ckDone.putIfAbsent(key, task)
    val winner = if (prev == null) { task.run(); task } else prev
    s.read.parquet(winner.get())
  }

  /** checkpointed() for builds that hand back a release handle (the
    * graphFromTriplesReleasable contract): release fires right after
    * the checkpoint write, so the build's internal persisted tables
    * never outlive the write. */
  private def checkpointedRelease(s: SparkSession, key: String)(
      make: => (DataFrame, () => Unit)): DataFrame = {
    val task = new java.util.concurrent.FutureTask[String](() => {
      val (df, release) = make
      val p = s"$ckDir/$key"
      try df.write.mode("overwrite").parquet(p) finally release()
      p
    })
    val prev = ckDone.putIfAbsent(key, task)
    val winner = if (prev == null) { task.run(); task } else prev
    s.read.parquet(winner.get())
  }

  /** Checkpointed KB link table over the corpus's distinct entity
    * surfaces (surface, uri, link_confidence) — the exact+fuzzy-JW
    * linking stage, run ONCE per JVM and consumed by both the kg_links
    * query and the vocabulary→IRI build below. The surface set (subj
    * surfaces ∪ entity objects, distinct) is the same set the graph
    * build's rollup produces. */
  def linksFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"links_${pagesFor(dir)}") {
      val trip = triplesFor(s, dir)
      val surfaces = trip.select(col("subj_surface").as("surface"))
        .unionByName(trip.filter(col("obj_is_entity")).select(col("obj").as("surface")))
        .distinct()
      Pipeline.linkSurfaces(surfaces, Corpus.kb(s), kbCountHint = kbCountHint)
    }

  /** Checkpointed vocabulary→IRI table (the linking+mint stage of the
    * graph build): kg_nodes_edges, kg_node_props and the edge
    * checkpoint all consume it, so the surface rollup and the KB link
    * joins run once per JVM instead of once per consumer (the links
    * themselves come from the shared linksFor checkpoint). */
  def surfaceIriFor(s: SparkSession, dir: String): DataFrame =
    checkpointedRelease(s, s"surface_iri_${pagesFor(dir)}") {
      import s.implicits._
      val (df, _, release) = Pipeline.surfaceIriReleasable(
        triplesFor(s, dir).as[TripleRow], Corpus.kb(s), kbCountHint = kbCountHint,
        precomputedLinks = Some(linksFor(s, dir).select(col("surface"), col("uri"))))
      (df, release)
    }

  /** Checkpointed deduped triples of the synthesized corpus at this sf.
    * Stays the FUSED pages pass: measured (BenchExtra `warmup` mode),
    * the whole fused synthesis+extract+chunk+coref+relations pass is
    * ~0.6 s warm, while deriving triples from the resolved parquet
    * costs ~3.6 s — decoding the mention_map MAP column per chunk row
    * dwarfs the re-run NLP, so "share the NLP pass" loses to "re-run
    * it fused" here (guide §1.1: the ideal plan lost to a gotcha;
    * measure, don't assume). */
  def triplesFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"triples_${pagesFor(dir)}")(
      Kg.pagesToTriples(Corpus.pages(s, pagesFor(dir))).toDF)

  /** Checkpointed resolved chunks (stage-0 output) at this sf. */
  def resolvedFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"resolved_${pagesFor(dir)}")(
      Kg.resolve(Kg.chunk(Kg.extractText(Corpus.pages(s, pagesFor(dir))))).toDF)

  /** Checkpointed first-wins entity table (A1) — the mentions NLP pass
    * over the resolved chunks runs once here instead of once per
    * consuming query (kg_entity_table, kg_last_entity_of_type,
    * kg_context_summary). */
  def entityTableFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"entities_${pagesFor(dir)}") {
      import s.implicits._
      Kg.entityTable(Kg.mentions(resolvedFor(s, dir).as[ResolvedRow]))
    }

  /** Checkpointed gold triples of the corpus at this sf (kg_eval_prf
    * and kg_eval_aggregate both consume it; generating it re-runs the
    * full page synthesis, so pay that once). */
  def goldFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"gold_${pagesFor(dir)}")(
      Corpus.gold(s, pagesFor(dir)).toDF)

  /** Per-JVM memoized k-means IVF codebook for the sf's embeddings
    * table. Spark double sums carry partition-order ulp jitter, so the
    * fit is not bit-reproducible ACROSS runs — memoizing makes Verify's
    * input dump and the q_knn_ivf_trained query share the exact same
    * doubles inside one JVM (the production analogue: fit once, persist
    * the codebook, every reader loads the table). */
  private val ivfCache = scala.collection.mutable.HashMap.empty[String, Array[Array[Double]]]
  def ivfCentroidsFor(s: SparkSession, dir: String): Array[Array[Double]] =
    ivfCache.synchronized {
      ivfCache.getOrElseUpdate(dir,
        ops.Similarity.fitCentroids(t(s, dir, "embeddings"), dim = 64, k = 8, iters = 3))
    }

  /** Per-JVM memoized PQ codebooks (same memoization rationale as
    * ivfCentroidsFor: the fit's double sums carry partition-order ulp
    * jitter, so Verify's dump and q_knn_pq must share one fit). */
  private val pqCache = scala.collection.mutable.HashMap.empty[String, Array[Array[Array[Double]]]]
  def pqCodebooksFor(s: SparkSession, dir: String): Array[Array[Array[Double]]] =
    pqCache.synchronized {
      pqCache.getOrElseUpdate(dir,
        ops.Similarity.fitPqCodebooks(t(s, dir, "embeddings"), dim = 64, m = 8, k = 8, iters = 3))
    }

  /** Per-JVM memoized Bloom seen-set over the src0 document texts
    * (same build-once/probe-many sharing as the codebook fits; the
    * build is deterministic md5 math, so unlike the k-means fits it is
    * bit-reproducible across runs too — memoization here just avoids
    * re-running the build job per caller). Keyed injectively on the
    * raw dir (the clustersFor md5-suffix scheme). */
  private val bloomCache = scala.collection.mutable.HashMap.empty[String, Array[Long]]
  def bloomFor(s: SparkSession, dir: String): Array[Long] =
    bloomCache.synchronized {
      val raw = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      bloomCache.getOrElseUpdate(s"bloom_$raw", {
        ops.Sketch.bloomBuild(
          t(s, dir, "documents").filter(col("source") === "src0"),
          "text", mBits = 1024, kHashes = 4)
      })
    }

  /** Driver-side KB row count (no Spark job — the label list is a local
    * Seq), passed as the kbCountHint so linking's size-tier decision
    * never pays a count() job per call (VERDICT r03 #1). */
  private lazy val kbCountHint: Option[Long] = Some(Corpus.kbSize())

  /** Checkpointed edge table of the corpus graph at this sf (the same
    * graphFromTriples build kg_nodes_edges runs, written once and
    * reused by the graph-analytics queries). */
  def edgesFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"edges_${pagesFor(dir)}") {
      val siri = surfaceIriFor(s, dir)
      // tier off the checkpoint's size (a metadata-cheap parquet count)
      // so the join-back keeps the broadcast-vs-salted discipline
      Pipeline.edgesFromVocab(triplesFor(s, dir), siri,
        useBroadcast = siri.count() <= Pipeline.defaultBroadcastVocabLimit)
    }

  /** Checkpointed DISTINCT directed entity-edge view — the multi-hop /
    * iterative graph queries all consume it, and re-deduplicating the
    * O(corpus) edge table per query is a repeated shuffle (round-4
    * bench: ~1-2 s each for kg_two_hop/kg_pagerank/kg_triangles). */
  def distinctEdgesFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"ge_${pagesFor(dir)}")(
      Graph.entityEdges(edgesFor(s, dir)))

  /** Checkpointed (url, warc_ts) of the corpus at this sf. */
  def pagesTsFor(s: SparkSession, dir: String): DataFrame =
    checkpointed(s, s"pages_ts_${pagesFor(dir)}")(
      Corpus.pages(s, pagesFor(dir)).toDF.select(col("url"), col("warc_ts")))

  /** Per-JVM one-shot streaming-parity run: a deterministic fifth of
    * the corpus (url id % 5 == 0, re-derivable in SQL) streams through
    * StreamIngest.runLinked under Trigger.AvailableNow with
    * maxFilesPerTrigger=16 over 32 page files (at least two REAL
    * micro-batches, each extracting with 16 scan tasks), producing both
    * the linked edge table and the per-batch node deltas. kg_stream_parity (edges) and
    * kg_stream_parity_nodes (nodes) read this single run — the run's
    * parquet output IS the checkpoint. Returns the run's out dir. */
  private val streamRunCache = scala.collection.mutable.HashMap.empty[String, String]
  private def streamParityOutFor(s: SparkSession, dir: String): String =
    streamRunCache.synchronized {
      streamRunCache.getOrElseUpdate(s"stream_parity_${pagesFor(dir)}", {
        val base = java.nio.file.Files
          .createTempDirectory("graft_stream_parity").toString
        // the slice is "page id % 5 == 0" and the page is a pure
        // function of its id, so generate ONLY those ids (range with
        // step 5) instead of synthesizing the full corpus and filtering
        // 4/5 of it away — identical page rows, 1/5 the generation work
        // and no repartition shuffle of the HTML payloads (guide §1.2).
        // 32 files with maxFilesPerTrigger=16 still forces the SAME two
        // real micro-batches, but each batch's extraction now runs 16
        // scan tasks instead of one per file — the 2-file batches left
        // 30 of 32 cores idle through the whole NLP stage (guide §2.6;
        // measured via the BenchExtra stage trace). Outputs are
        // batching-invariant: every page's triples/edges/node rows are
        // pure functions of (page, KB) and the node fold is associative
        // (the §2.9 law kg_stream_parity* pins), so WHICH batch a page
        // lands in cannot change either parity table.
        import s.implicits._
        val slice = s.range(0, pagesFor(dir), 5, 32).map(id => Corpus.genPage(id)._1)
        slice.toDF.write.mode("overwrite").parquet(s"$base/pages")
        val q = graft.streaming.StreamIngest.runLinked(s, s"$base/pages",
          s"$base/out", s"$base/ck", Corpus.kb(s), kbCountHint = kbCountHint,
          maxFilesPerTrigger = Some(16))
        q.awaitTermination()
        s"$base/out"
      })
    }

  /** Per-JVM checkpointed near-dup cluster table of the documents
    * table (LSH pairs → connected components) — shared by
    * q_dedup_clusters and q_dedup_keep_best so the pair set is signed
    * once per JVM (VERDICT r04 pair-set-reuse note). */
  def clustersFor(s: SparkSession, dir: String): DataFrame = {
    // keyed on the FULL dir (sanitized for the path): this checkpoint's
    // identity is the input directory itself — a digit-only key would
    // alias two dirs with the same sf residue (review r05). The md5
    // suffix of the RAW dir makes the key injective: sanitization maps
    // e.g. /a/b and /a_b to the same string (ADVICE r05)
    val raw = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(4).map(b => f"${b & 0xff}%02x").mkString
    checkpointed(s,
      s"dedup_clusters_${dir.replaceAll("[^A-Za-z0-9._-]", "_")}_$raw")(
      ops.Dedup.connectedComponents(
        ops.Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text")))
  }

  /** Per-JVM memoized BPE fit (top-200 vocab, 6 merges) — TRAINED once
    * and shared by q_bpe_merges (reports the learned merge list) and
    * q_bpe_encode (applies it to every document), so the corpus
    * tokenize+agg and the driver merge loop run once per JVM, the same
    * train/apply sharing as ivfCentroidsFor. Keyed injectively on the
    * raw dir (the clustersFor md5-suffix scheme). */
  private val bpeFitCache =
    scala.collection.mutable.HashMap.empty[String, Seq[(Int, String, String, Long)]]
  def bpeFitFor(s: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    bpeFitCache.synchronized {
      val raw = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      bpeFitCache.getOrElseUpdate(s"bpe_$raw", {
        ops.TextAnalysis.bpeTrain(
          ops.TextAnalysis.bpeVocab(t(s, dir, "documents"), "text", 200), 6)
      })
    }

  /** Force every SHARED per-JVM artifact (the extract-once checkpoints
    * and the memoized IVF codebook reused across many queries) so
    * per-query bench numbers measure the QUERY, not whichever query
    * happens to first-touch a shared build (VERDICT r04 #6 — e.g.
    * kg_retry_feedback was charged ~3.5 s of triples-checkpoint build
    * when it ran first). Bench times this as its own named step. */
  def warmupSharedCheckpoints(s: SparkSession, dir: String): Unit = {
    // Independent build CHAINS run concurrently (guide §2.6: the
    // scheduler happily runs several jobs at once; later jobs back-fill
    // executors the current job's stragglers leave idle). Dependencies
    // stay inside one chain; the per-key FutureTask memo makes a build
    // shared by two chains run exactly once.
    val chains: Seq[() => Unit] = Seq(
      // critical path: triples → links → vocab IRIs → edges → distinct
      // edges (independent of the resolved chain — triples use the
      // fused pass)
      () => {
        triplesFor(s, dir).count()
        linksFor(s, dir).count()
        surfaceIriFor(s, dir).count()
        edgesFor(s, dir).count()
        distinctEdgesFor(s, dir).count()
        ()
      },
      () => {
        resolvedFor(s, dir).count()
        entityTableFor(s, dir).count() // the mentions pass over resolved
        ()
      },
      () => { clustersFor(s, dir).count(); () },
      () => { ivfCentroidsFor(s, dir); pqCodebooksFor(s, dir); () },
      () => { bpeFitFor(s, dir); bloomFor(s, dir); () },
      () => { pagesTsFor(s, dir).count(); goldFor(s, dir).count(); () },
      // the one REAL streaming run is a SHARED artifact too — BOTH
      // parity queries read its output (the r4 warmup contract: a
      // first-touch shared build must never be charged to whichever
      // query happens to run first), and as its own chain the mostly
      // driver-bound micro-batch machinery overlaps the CPU-bound
      // builds above (guide §2.6)
      () => { streamParityOutFor(s, dir); () })
    val names = Seq("triples+graph", "resolved+entities", "clusters",
      "ivf+pq", "bpe+bloom", "pagesTs+gold", "stream_parity")
    // 4 build slots, longest chains first: running all seven chains at
    // once lets the short fit/gold chains steal cores from the two
    // critical chains (measured: stream_parity 14 s solo → 19 s under
    // 7-way contention); with 4 slots the short chains back-fill as
    // slots free up (guide §2.6: "2-3 jobs in flight is plenty")
    val order = Seq(6, 0, 2, 1, 3, 4, 5) // stream, graph, clusters, resolved, then short
    val ordered = order.map(i => (chains(i), names(i)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = ordered.map { case (c, n) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val t0 = System.nanoTime()
            c()
            // stderr trace so the warmup's composition stays observable
            // per run (never parsed by the driver, which reads only the
            // one JSON stdout line)
            System.err.println(
              f"[warmup] $n%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
        })
      }
      // propagate the FIRST failure loudly (the bench treats a warmup
      // throw as a failed entry — same contract as the sequential form)
      futures.foreach(_.get())
    } finally pool.shutdown()
    ()
  }

  /** Reference WebNLG fixtures (read-only test DATA, cited; the eid/
    * mtriple/text structure is the public WebNLG corpus format). The
    * glob reads BOTH corpora (astronaut 72 + airport 301 entries) —
    * wholetext gives one row per file, so the parse parallelizes per
    * file exactly as a many-file corpus would. */
  val webnlgPath = "/root/reference/tests/fixtures/webnlg-*.xml"

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * pipeline pages→triples→eval, one row of P/R/F1. */
  def entry(spark: SparkSession): DataFrame = {
    val n = 2000L
    val predicted = Kg.pagesToTriples(Corpus.pages(spark, n)).toDF
    Eval.prfDf(predicted, Corpus.gold(spark, n).toDF)
  }

  // chunk-count estimate (chunking.rs:89-96 arithmetic) as a UDF — the
  // one query-side kernel function without a Column/Expression form
  private val chunkCountUdf = udf((n: Long) =>
    if (n <= 3500L) 1L else (n + 3100L - 1L) / 3100L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- KG pipeline (rows-only checks) ----------------
    "kg_triples" -> ((s, dir) => {
      triplesFor(s, dir).select("url", "subj", "pred", "obj")
    }),
    "kg_eval_prf" -> ((s, dir) => {
      Eval.prfDf(triplesFor(s, dir), goldFor(s, dir))
    }),
    "kg_nodes_edges" -> ((s, dir) => {
      // nodes/edges from the SHARED vocabulary checkpoint (identical
      // tables: reduceNodes over surfaceIri is the graphFromTriples
      // node build, and edgesFor is its edge build, checkpointed)
      val trip = triplesFor(s, dir)
      val siri = surfaceIriFor(s, dir)
      val nodes = Pipeline.reduceNodes(siri.select(col("iri"), col("entity_type"),
        col("surface").as("name"), col("slug")))
      nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(edgesFor(s, dir).agg(count(lit(1)).as("n_edges")))
        .crossJoin(trip.agg(count(lit(1)).as("n_triples"),
          sum(when(col("subj_type") =!= "", 1).otherwise(0)).as("n_typed")))
    }),
    "kg_entity_table" -> ((s, dir) => entityTableFor(s, dir)),
    // J1-J5: the linking stage over the corpus's distinct surfaces —
    // exact + blocked-fuzzy JW + top-1, oracle-checked against DuckDB's
    // jaro_winkler_similarity
    "kg_links" -> ((s, dir) => {
      // the shared link checkpoint (identical rows: same surface set,
      // same linkSurfaces build; parquet round-trips the confidence
      // doubles exactly, rounding applied here as before)
      linksFor(s, dir)
        .select(col("surface"), col("uri"),
          round(col("link_confidence"), 4).as("link_confidence"))
    }),
    // T4⁻¹: JSON-LD document emission (the reference's native output)
    "kg_jsonld_docs" -> ((s, dir) => {
      import s.implicits._
      Pipeline.jsonLdDocuments(triplesFor(s, dir).as[TripleRow])
    }),
    // graph analytics over the constructed KG: degree centrality
    "kg_degrees" -> ((s, dir) => {
      Graph.degrees(edgesFor(s, dir))
    }),
    // weakly-connected components of the entity graph, labeled by each
    // component's lexicographic min IRI (size-tiered union-find under
    // the hood — the same machinery as near-dup clustering)
    "kg_components" -> ((s, dir) => {
      Graph.components(distinctEdgesFor(s, dir), assumeDistinct = true)
    }),
    // 2-hop directed neighborhoods of the 3 smallest source IRIs
    "kg_two_hop" -> ((s, dir) => {
      val ge = distinctEdgesFor(s, dir)
      val seeds = ge.select(col("src_iri").as("iri"))
        .distinct().orderBy(col("iri")).limit(3)
      Graph.twoHopNeighbors(ge, seeds, assumeDistinct = true)
    }),
    // fixed-iteration PageRank (5 iters, d = 0.85) over entity edges
    "kg_pagerank" -> ((s, dir) => {
      Graph.pageRank(distinctEdgesFor(s, dir), assumeDistinct = true)
    }),
    // per-node triangle counts over the undirected entity graph
    "kg_triangles" -> ((s, dir) => {
      Graph.triangleCounts(distinctEdgesFor(s, dir), assumeDistinct = true)
    }),
    // SPARQL-style BGP: who works where and was born where (two
    // patterns conjoined on ?person; DataFrame joins, Catalyst plans)
    "kg_bgp" -> ((s, dir) => {
      import graft.kernel.Porter
      Graph.bgp(edgesFor(s, dir), Seq(
        ("?person", Porter.stemPredicate("worksFor"), "?org"),
        ("?person", Porter.stemPredicate("birthPlace"), "?city")))
    }),
    // A4: latest entity of each type per document (max_by offset)
    "kg_last_entity_of_type" -> ((s, dir) => {
      Kg.lastEntityOfType(entityTableFor(s, dir))
    }),
    // A3: per-entity properties, last-write-wins (exploded map form)
    "kg_entity_props" -> ((s, dir) => {
      Kg.entityProps(triplesFor(s, dir))
    }),
    // A3 on the NODE table: per-IRI props map (graphFromTriples
    // includeProps tier), exploded for the oracle
    "kg_node_props" -> ((s, dir) => {
      // the includeProps node tier against the SHARED vocabulary
      // checkpoint: the original left-join onto the full node table
      // then props-not-null filter keeps exactly the byIri rows, so
      // nodePropsFromVocab alone is row-identical (oracle-verified)
      Pipeline.nodePropsFromVocab(triplesFor(s, dir), surfaceIriFor(s, dir))
        .filter(col("props").isNotNull)
        .select(col("iri"), explode(col("props")).as(Seq("pred", "last_obj")))
    }),
    // S-family: WebNLG XML corpus ingest + gold denormalization over the
    // reference's own fixture data (tests/fixtures/webnlg-astronaut.xml)
    "webnlg_triples" -> ((s, dir) => {
      sources.WebNlg.goldTriples(sources.WebNlg.entries(s, webnlgPath))
    }),
    // J7/A8 on reference data: rule-based extraction from the WebNLG
    // lexicalizations vs the mtriple gold, per-category P/R
    "webnlg_eval" -> ((s, dir) => {
      val e = sources.WebNlg.entries(s, webnlgPath)
      sources.WebNlg.evalByCategory(
        sources.WebNlg.predicted(e), sources.WebNlg.normalizedGold(e))
    }),
    // A2+A5: coref alias sets + the per-document context summary string
    "kg_context_summary" -> ((s, dir) => {
      import s.implicits._
      val resolved = resolvedFor(s, dir).as[ResolvedRow]
      Kg.contextSummary(entityTableFor(s, dir), Kg.aliasTable(resolved))
    }),

    // ---------------- relational operators with DuckDB oracles ----------------
    // A8-style aggregation (partial+final hash agg; map-side combine)
    "q_agg_group" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // J1 equi-join, broadcast dim side
    "q_join_broadcast" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    }),
    // J3/W1 top-1 per group via window with deterministic tie-break
    "q_topk_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), round(col("o_totalprice"), 2).as("best_price"))
    }),
    // J7 anti-join (customers with no high-value orders)
    "q_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),
    // J8 set intersection — ONE scan + ONE exchange: a part key is in
    // the intersection iff some row clears the discount filter AND some
    // row clears the tax filter, so per-key max-flags over a single
    // pass replace filter-distinct-each-side + intersect join
    // (set-identical to a.intersect(b); guide §2.4)
    "q_intersect" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(max(when(col("l_discount") >= 0.05, 1)).as("__a"),
          max(when(col("l_tax") >= 0.04, 1)).as("__b"))
        .filter(col("__a").isNotNull && col("__b").isNotNull)
        .select(col("l_partkey"))
        .orderBy(col("l_partkey"))
    }),
    // P4 slugify — native Catalyst Expression (codegen'd, no UDF) vs
    // an independent DuckDB regexp oracle
    "q_slug" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          functions.SlugExpression.slug(col("c_name")).as("slug"))
    }),
    // T1 chunk-count estimate (chunking.rs:89-96 arithmetic)
    "q_chunk_estimate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), chunkCountUdf(col("n_chars")).as("est_chunks"))
    }),

    // ---------------- training-data pipeline ops ----------------
    // exact dedup by md5 fingerprint of normalized text
    "q_dedup_exact" -> ((s, dir) => {
      ops.Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
    }),
    // MinHash+LSH near-dup candidate pairs — DuckDB oracle re-derives
    // the full signature + banding (Oracles.qDedupMinhashLsh); planted
    // near-duplicate recall additionally tested in OpsSpec
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      ops.Dedup.lshCandidates(t(s, dir, "documents"), "doc_id", "text")
    }),
    // near-dup pairs → CLUSTERS: connected components over the LSH
    // candidate graph (min-id canonical representative per cluster)
    "q_dedup_clusters" -> ((s, dir) => clustersFor(s, dir)),
    // the dedup DECISION: one survivor per near-dup cluster (longest
    // text, ties to min id), the rest marked drops — consumes the
    // same memoized cluster table as q_dedup_clusters (the VERDICT
    // r04 pair-set-reuse note)
    "q_dedup_keep_best" -> ((s, dir) => {
      ops.Dedup.keepBestPerCluster(
        t(s, dir, "documents"), "doc_id", "text", clustersFor(s, dir))
    }),
    // Gopher-style repetition filters (dup-sentence + top-bigram fracs)
    "q_text_repetition" -> ((s, dir) => {
      ops.TextAnalysis.repetitionFeatures(
        t(s, dir, "documents").filter(length(col("text")) > 0), "doc_id", "text")
    }),
    // C4-style cross-document line dedup (first occurrence wins)
    "q_line_dedup" -> ((s, dir) => {
      ops.TextAnalysis.lineDedup(t(s, dir, "documents"), "doc_id", "text")
    }),
    // span-level exact dedup (the Lee et al. 2022 axis): cross-document
    // duplicated PASSAGES — 8-gram span keys, global first occurrence,
    // per-doc interval merge into maximal duplicated token ranges
    "q_span_dedup" -> ((s, dir) => {
      ops.Dedup.spanDedup(t(s, dir, "documents"), "doc_id", "text")
    }),
    // sequence packing: concat-and-chunk token layout, 512-token budget
    "q_pack_sequences" -> ((s, dir) => {
      ops.TextAnalysis.packSequences(t(s, dir, "documents"), "doc_id", "text", budget = 512L)
    }),
    // incremental LSH dedup index: index the even docs, probe with the
    // odd docs — cross-corpus candidate pairs WITHOUT re-signing the
    // indexed side (the production recrawl-dedup shape)
    // memoized via checkpointed(): the index write + probe is a side
    // effect, paid once per (JVM, sf) instead of on every invocation
    // (VERDICT r03 "What's wrong" #4)
    "q_dedup_index_probe" -> ((s, dir) => {
      checkpointed(s, s"dedup_index_probe_${pagesFor(dir)}") {
        val d = t(s, dir, "documents")
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft_lshidx").toString + "/idx"
        ops.Dedup.lshIndexWrite(d.filter(col("doc_id") % 2 === 0), "doc_id", "text", idxDir)
        val (cross, _, _) = ops.Dedup.lshIndexProbe(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", idxDir)
        cross
      }
    }),
    // SimHash 64-bit signatures — one-pass kernel (equivalence-tested
    // against the columnar spec; hamming property in OpsSpec)
    "q_dedup_simhash" -> ((s, dir) => {
      ops.Dedup.simhashTable(t(s, dir, "documents"), "doc_id", "text")
    }),
    // SimHash candidate pairs: 16-bit-chunk blocking (recall-complete
    // for Hamming <= 3 by pigeonhole) + exact distances, no thresholding
    "q_dedup_simhash_pairs" -> ((s, dir) => {
      ops.Dedup.simhashCandidates(t(s, dir, "documents"), "doc_id", "text")
    }),
    // n-gram (token) Jaccard over a deterministic candidate pairing
    "q_jaccard_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(length(col("text")) > 0)
      val a = d.select(col("doc_id").as("id1"), col("text").as("t1"))
      val b = d.select(col("doc_id").as("id2"), col("text").as("t2"))
      // token sets materialized once per side (CLAUDE.md rule: inline
      // array-expression reuse duplicates work per reference)
      a.join(b, col("id2") === col("id1") + 250)
        .withColumn("s1", array_distinct(split(col("t1"), " ")))
        .withColumn("s2", array_distinct(split(col("t2"), " ")))
        .select(col("id1"), col("id2"),
          round(size(array_intersect(col("s1"), col("s2"))).cast("double") /
            size(array_union(col("s1"), col("s2"))), 4).as("jaccard"))
    }),
    // embedding-cosine near-dup pairs via hyperplane LSH buckets
    // threshold 0.2: the driver's embeddings are random vectors (true
    // near-dups don't exist), so this exercises the bucketed-pair path;
    // planted-duplicate recall is tested in OpsSpec at 0.95.
    "q_dedup_embedding" -> ((s, dir) => {
      ops.Similarity.nearDupPairs(t(s, dir, "embeddings"), dim = 64, nBits = 8, threshold = 0.2)
    }),
    // int8 scalar quantization of embeddings (ANN memory lever); the
    // qvec rides as a scalar md5 fingerprint + L1 norm because the
    // driver compare cannot hash array columns
    "q_quantize_int8" -> ((s, dir) => {
      val q = ops.Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
      q.select(col("vec_id"), col("qscale"),
        md5(concat_ws(",", transform(col("qvec"), _.cast("string")))).as("qvec_fp"),
        aggregate(col("qvec"), lit(0L), (acc, v) => acc + abs(v)).as("q_l1"))
    }),
    // per-document top-5 TF-IDF keywords
    "q_tfidf" -> ((s, dir) => {
      ops.TextAnalysis.tfidfTopK(t(s, dir, "documents"), "doc_id", "text", 5)
    }),
    // deterministic train/val/test split (md5-bucketed — stable across
    // runs/engines, the no-seed-file dataset split)
    "q_data_split" -> ((s, dir) => {
      ops.TextAnalysis.assignSplit(
        t(s, dir, "documents").select(col("doc_id")), "doc_id")
    }),
    // tokenizer-prep vocabulary: top-100 tokens with cumulative corpus
    // coverage (global window bounded by the top-K limit)
    "q_vocab_coverage" -> ((s, dir) => {
      ops.TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text", 100)
    }),
    // BPE-merge tokenizer training: 6 learned merges over the top-200
    // word-frequency table (corpus pays one tokenize+agg; the merge
    // loop is driver-side on the vocabulary-sized table — the k-means
    // codebook tier); oracle unrolls the same 6 iterations in SQL
    "q_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      bpeFitFor(s, dir).toDF("merge_idx", "lsym", "rsym", "pair_count")
    }),
    // tokenizer APPLICATION: encode every document with the trained
    // merge list (model-sized, broadcast) — per-doc word and BPE-token
    // counts, the number a token-budget pipeline bills against. One
    // narrow scan, no shuffle/join; shares the per-JVM fit with
    // q_bpe_merges so train happens once
    "q_bpe_encode" -> ((s, dir) => {
      ops.TextAnalysis.bpeEncode(t(s, dir, "documents"), "doc_id", "text",
        bpeFitFor(s, dir).map(m => (m._2, m._3)))
    }),
    // Bloom seen-set membership (the crawl/ingest dedup-gate): filter
    // built once over the src0 texts (1024 bits, 4 md5-derived
    // hashes — deterministic, so the oracle re-derives the identical
    // bitset), every document probed by a narrow broadcast-bitset scan
    "q_bloom_seen" -> ((s, dir) => {
      ops.Sketch.bloomProbe(t(s, dir, "documents"), "doc_id", "text",
        bloomFor(s, dir), mBits = 1024, kHashes = 4)
    }),
    // crawl snapshot diff: two deterministic corpus versions (old drops
    // the %10==0 slice; new drops %10==1 and rewrites %10==2) classified
    // added/removed/changed/unchanged by one fingerprint outer join
    "q_snapshot_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val oldV = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val newV = docs.filter(pmod(col("doc_id"), lit(10)) =!= 1)
        .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 2,
          concat(col("text"), lit(" v2"))).otherwise(col("text")))
      ops.TextAnalysis.snapshotDiff(oldV, newV, "doc_id", "text")
    }),
    // word2vec negative-sampling distribution: unigram^0.75 normalized
    // over the full vocabulary, top-100 by exact count
    "q_neg_sampling" -> ((s, dir) => {
      ops.TextAnalysis.negativeSamplingTable(t(s, dir, "documents"), "text",
        alpha = 0.75, k = 100)
    }),
    // exact per-group percentiles (type-7 linear interpolation — the
    // one formula Spark's percentile and DuckDB's quantile_cont share)
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.25)), 4).as("p25"),
          round(percentile(col("value"), lit(0.5)), 4).as("p50"),
          round(percentile(col("value"), lit(0.75)), 4).as("p75"),
          round(percentile(col("value"), lit(0.95)), 4).as("p95"))
    }),
    // phrase mining (word2phrase): discounted adjacent-bigram ratio
    // over vocabulary-bounded count tables, top-50 via TakeOrdered
    "q_phrase_mine" -> ((s, dir) => {
      ops.TextAnalysis.phraseMine(t(s, dir, "documents"), "text",
        delta = 1.0, minCount = 5L, k = 50)
    }),
    // count-min sketch heavy hitters: d*w-bounded counter table, min
    // of d counters per token, exact count alongside the estimate;
    // global top-20 via orderBy+limit (TakeOrdered, no global sort)
    "q_cms_topk" -> ((s, dir) => {
      ops.Sketch.cmsHeavyHitters(t(s, dir, "documents"), "text",
        w = 512, d = 4, k = 20)
    }),
    // HyperLogLog distinct-token cardinality (raw estimator): m=128
    // registers from one max-combine aggregation, exact distinct next
    // to the estimate so the sketch error is visible data
    "q_hll_distinct" -> ((s, dir) => {
      val toks = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
      ops.Sketch.hllDistinct(toks, "token", b = 7)
    }),
    // DSIR-shape importance weights: hashed-unigram log(p_tgt/p_src)
    // per doc, target slice = the src0 domain (the "Wikipedia" role);
    // model is a 64-row conditional agg, scoring a broadcast join
    "q_dsir_weights" -> ((s, dir) => {
      ops.TextAnalysis.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", buckets = 64)
    }),
    // corpus-trained bigram LM scoring (the perplexity-filter shape):
    // add-one-smoothed transitions trained on the corpus itself, docs
    // scored by mean bigram log-probability
    "q_lm_score" -> ((s, dir) => {
      ops.TextAnalysis.lmScore(t(s, dir, "documents"), "doc_id", "text")
    }),
    // C4/Gopher-style composite quality gate: keep/drop + reasons
    "q_quality_filter" -> ((s, dir) => {
      ops.TextAnalysis.qualityFilter(t(s, dir, "documents"), "doc_id", "text")
    }),
    // brute-force cosine top-k (ANN correctness baseline)
    "q_knn_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.bruteForceTopK(q, e, 5)
    }),
    // IVF ANN (inverted-list scale path, nProbe=4 of 8 lists)
    "q_knn_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.ivfTopK(q, e, dim = 64, nCentroids = 8, nProbe = 4, k = 5)
    }),
    // IVF over the TRAINED k-means codebook (fitCentroids, persisted as
    // a tiny centroid table by Verify; oracle re-derives assignment,
    // probes and ranking from the dumped doubles)
    "q_knn_ivf_trained" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.ivfTopKWith(q, e, dim = 64,
        centroids = ivfCentroidsFor(s, dir), nProbe = 4, k = 5)
    }),
    // product-quantized ANN (the billion-vector MEMORY tier): corpus
    // compressed to m=8 one-byte codes/vector by trained per-subspace
    // k-means codebooks, queries scored by ADC table lookups; the
    // codebooks are persisted by Verify and the oracle re-derives
    // encode + ADC ranking from the dumped doubles
    "q_knn_pq" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.pqTopK(q, e, dim = 64, books = pqCodebooksFor(s, dir), k = 5)
    }),
    // SemDeDup (k-means-partitioned semantic dedup): every vector
    // assigned to its nearest TRAINED centroid (the shared per-JVM
    // fit), within-cluster cosine >= threshold drops the higher id;
    // oracle re-derives assignment + keep rule from the dumped doubles
    "q_semdedup" -> ((s, dir) => {
      ops.Similarity.semDedup(t(s, dir, "embeddings"),
        centroids = ivfCentroidsFor(s, dir), threshold = 0.2)
    }),
    // multiprobe LSH ANN: own bucket + every Hamming-1 neighbor probed
    "q_knn_lsh_multiprobe" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.lshTopKMultiprobe(q, e, dim = 64, nBits = 4, k = 5)
    }),
    // LSH-bucketed ANN (scale path; recall vs brute measured in OpsSpec)
    "q_knn_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      ops.Similarity.lshTopK(q, e, dim = 64, nBits = 4, k = 5)
    }),
    // text analysis: token counts + quality features
    "q_text_quality" -> ((s, dir) => {
      ops.TextAnalysis.qualityFeatures(
        t(s, dir, "documents").filter(length(col("text")) > 0), col("text"))
        .select("doc_id", "n_tokens", "punct_ratio", "stopword_ratio", "mean_word_len")
    }),
    // token counting (whitespace + BPE-ish regex) + rolling-hash
    // document fingerprint — all cross-engine exact
    "q_text_tokens" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(length(col("text")) > 0)
      d.select(col("doc_id"),
        ops.TextAnalysis.tokenCount(col("text")).as("n_ws"),
        ops.TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
        ops.TextAnalysis.rollingHash(col("text")).as("rolling_fp"))
    }),
    // scalable similarity self-join: log-size-bucketed equi-join
    // (sound by the Jaccard <= min/max size bound) + exact set-overlap
    // filter, never the cartesian the naive theta-join plans; oracle is
    // the brute-force cross join (the JW variant of this operator is
    // gated in-engine instead — DuckDB's jaro_winkler disagrees with
    // strsim on transposition counting for some pairs)
    "q_sim_join" -> ((s, dir) => {
      // every-10th-doc sample: the synthetic corpus is pathologically
      // self-similar (24% of ALL pairs clear 0.8 Jaccard — 3M matching
      // pairs at sf0.1), so the unsampled demo would be a genuinely
      // quadratic workload by OUTPUT size, not by plan shape
      val d = t(s, dir, "documents")
        .filter(length(col("text")) > 0 && col("doc_id") % 10 === 0)
      ops.Dedup.jaccardSimilarityJoin(d, "doc_id", "text", threshold = 0.8)
    }),
    // contains-constrained JW self-join (the fuzzy-linking regime) —
    // the variant WITH a cross-engine oracle: DuckDB's jaro_winkler
    // agrees with the kernel on contains pairs (VERDICT r04 ask #3).
    // Names are planted with FIXED-WIDTH numerals so every true
    // containment is token-aligned (the blocking's completeness
    // regime) and the brute-force SQL oracle is exact truth.
    "q_sim_join_jw" -> ((s, dir) => {
      val k = lpad((col("c_custkey") % 200).cast("string"), 3, "0")
      val named = t(s, dir, "customer").select(col("c_custkey").as("id"),
        when(col("c_custkey") % 3 === 0, concat(lit("acme systems "), k))
          .when(col("c_custkey") % 3 === 1,
            concat(lit("acme systems "), k, lit(" incorporated")))
          .otherwise(concat(lit("zenith labs "), k)).as("name"))
      ops.Dedup.jwContainsJoin(named, "id", "name", threshold = 0.9)
    }),
    // corpus datasheet: per-(lang, source) volume/dedup rollup
    "q_corpus_stats" -> ((s, dir) => {
      ops.TextAnalysis.corpusStats(t(s, dir, "documents"), "lang", "source", "text")
    }),
    // crawl URL canonicalization: messy urls planted deterministically
    // (mixed case, default port, utm params, fragment), normalized to
    // the dedup key — same regex spec re-run verbatim by the oracle
    "q_url_canonical" -> ((s, dir) => {
      val planted = t(s, dir, "customer").select(col("c_custkey"),
        concat(lit("HTTP://Example"), col("c_custkey"), lit(".COM:80/Path/"),
          col("c_custkey"), lit("?utm_source=x&id="), col("c_custkey"),
          lit("&utm_medium=y#frag")).as("url"))
      planted.select(col("c_custkey"),
        ops.Urls.canonicalizeUrl(col("url")).as("canon_url"))
    }),
    // PII redaction (C4-style scrub): deterministic PII is PLANTED into
    // every document (same construction in the oracle), then emails /
    // IPs / phones are counted and replaced by typed tokens — the
    // cascade order and the md5 of the redacted text are both under
    // oracle, with identical RE2-subset regexes on both engines
    "q_pii_redact" -> ((s, dir) => {
      val planted = t(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or 10.0.0."),
          pmod(col("doc_id"), lit(256)), lit(" tel 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))
      ops.TextAnalysis.redactPii(planted, "doc_id", "text")
    }),
    // benchmark decontamination: flag documents sharing any 8-token
    // shingle with the benchmark subset (doc_id % 97 == 0) — broadcast
    // benchmark shingles, narrow corpus explode, one doc-keyed count
    "q_decontaminate" -> ((s, dir) => {
      ops.TextAnalysis.decontaminate(t(s, dir, "documents"), "doc_id", "text",
        benchPred = col("doc_id") % 97 === 0)
    }),
    // training-mix sampling: per-source token-budgeted deterministic
    // subsample (the data-mixture primitive) — md5-ordered shuffle,
    // inclusive running token total <= budget
    "q_sample_mix" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      ops.TextAnalysis.sampleByTokenBudget(d, "source", "doc_id",
        col("n_chars") / lit(4), budget = 2000L)
    }),
    // feature-hashing document embedding (hashing trick, INTEGER
    // components — exact cross-engine): text -> 64-dim vector, emitted
    // as md5 fingerprint + L1 norm (driver compare can't hash arrays)
    "q_text_embed" -> ((s, dir) => {
      ops.TextAnalysis.hashEmbed(t(s, dir, "documents"), "doc_id", "text")
    }),
    // language-ID heuristic (argmax of stopword hits, deterministic ties)
    "q_lang_id" -> ((s, dir) => {
      ops.TextAnalysis.langId(
        t(s, dir, "documents").filter(length(col("text")) > 0), col("text"))
        .select("doc_id", "pred_lang", "lang_score")
    }),
    // multimodal video, THE one fake-header query left: stubbed
    // interframe-codec container decode (the H.264/ffmpeg seam model —
    // no JVM decoder for patent-encumbered interframe codecs exists
    // here) → frame sampling plan, one row per sampled frame with its
    // timestamp; the sampling PLAN over parsed metadata is real
    "q_multimodal_frames" -> ((s, dir) => {
      ops.Multimodal.frameSample(
        ops.Multimodal.decodeVideo(ops.Multimodal.videos(s, imagesFor(dir) / 5)), 30)
    }),
    // multimodal audio with a REAL codec end to end: WAV PCM decode →
    // fixed 512-sample windows over the DECODED samples with exact
    // integer segment statistics — decode + windowing both under the
    // formula oracle (VERDICT r05 #3: was a fake-header metadata plan)
    "q_multimodal_segments" -> ((s, dir) => {
      ops.Multimodal.wavSegmentStats(
        ops.Multimodal.wavAudios(s, imagesFor(dir) / 5), segSamples = 512)
    }),
    // multimodal with a REAL decoder: uncompressed 24-bit BMPs decoded
    // pixel-for-pixel (pure JVM); the oracle re-derives dimensions and
    // channel means from the generator formula, so header parse, row
    // order, BGR order and padding are all under oracle
    "q_multimodal_bmp" -> ((s, dir) => {
      ops.Multimodal.bmpChannelMeans(ops.Multimodal.bmpImages(s, imagesFor(dir) / 5))
    }),
    // REAL decode + REAL nearest-neighbor resize (3x2), means of the
    // resized pixels — the oracle re-derives the sampled coordinates
    "q_multimodal_bmp_resize" -> ((s, dir) => {
      ops.Multimodal.bmpResizedMeans(
        ops.Multimodal.bmpImages(s, imagesFor(dir) / 5), outW = 3, outH = 2)
    }),
    // REAL JDK codecs (javax.imageio, zero external jars): PNG and GIF
    // round-trip losslessly, so the decode — header, inflate/LZW,
    // palette, row order — sits under the exact formula oracle
    "q_multimodal_png" -> ((s, dir) => {
      ops.Multimodal.jdkChannelMeans(
        ops.Multimodal.codecImages(s, imagesFor(dir) / 5, "png"))
    }),
    "q_multimodal_gif" -> ((s, dir) => {
      ops.Multimodal.jdkChannelMeans(
        ops.Multimodal.codecImages(s, imagesFor(dir) / 5, "gif", wBase = 6, hBase = 5))
    }),
    // REAL JPEG decode (lossy): dims exact under oracle + per-channel
    // mean-error-bounded booleans the oracle expects true
    "q_multimodal_jpeg" -> ((s, dir) => {
      ops.Multimodal.jpegDecodeCheck(
        ops.Multimodal.jpegImages(s, imagesFor(dir) / 5))
    }),
    // REAL WAV PCM decode (javax.sound.sampled): container fields +
    // exact integer sample statistics under the formula oracle
    "q_multimodal_wav" -> ((s, dir) => {
      ops.Multimodal.wavDecodeStats(
        ops.Multimodal.wavAudios(s, imagesFor(dir) / 5))
    }),
    // REAL video container decode: animated GIF (multi-frame + frame
    // delays) — frame count, per-frame LZW pixel decode, sampling plan
    // and timeline all under the formula oracle
    "q_multimodal_video" -> ((s, dir) => {
      ops.Multimodal.gifFrameSample(
        ops.Multimodal.gifVideos(s, imagesFor(dir) / 5), stride = 2)
    }),
    // REAL video container #2: MJPEG-in-AVI — hand-parsed RIFF chunk
    // grammar, every frame a genuine JPEG decoded by the JDK; container
    // fields and timeline exact under oracle, frame pixels under the
    // JPEG-lossy error-bound booleans (VERDICT r04 ask #2)
    "q_multimodal_avi" -> ((s, dir) => {
      ops.Multimodal.aviFrameSample(
        ops.Multimodal.aviVideos(s, imagesFor(dir) / 5), stride = 2)
    }),
    // multimodal resize with REAL pixels end to end: JDK PNG decode
    // (inflate) → nearest-neighbor decimation → means of the RESIZED
    // pixels, so the sampled source coordinates sit under the formula
    // oracle (VERDICT r05 #3: was a fake-header metadata resize); 4x3
    // output vs bmp_resize's 3x2 so the two paths can't shadow each other
    "q_multimodal_resize" -> ((s, dir) => {
      ops.Multimodal.jdkResizedMeans(
        ops.Multimodal.codecImages(s, imagesFor(dir) / 5, "png"), outW = 4, outH = 3)
    }),
    // as-of (backward) join: each purchase attributed to the user's
    // latest click at or before it — the operator Spark lacks natively,
    // composed as tagged union + one ordered window (one shuffle)
    "q_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      ops.AsOf.asofJoin(purchases, clicks, "user_id", "ts", "event_id", Seq("value"))
    }),
    // range join: same-user event pairs within 5 minutes (bucketized
    // equi-join, never an inequality cross-join)
    "q_range_join" -> ((s, dir) => {
      ops.AsOf.temporalNeighbors(t(s, dir, "events"),
        "user_id", "event_id", "ts", windowSec = 300L)
    }),
    // S3: semi-structured JSON column ingest + aggregation
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    // event-time windowed aggregation (streaming shape on batch data)
    "q_window_events" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    }),
    // SLIDING event-time windows (the Structured Streaming
    // window(size, slide) idiom on batch data): each event expands to
    // size/slide = 6 window rows scan-side — the generator shape a
    // streaming job would maintain as state; one (window, type) shuffle
    "q_window_sliding" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("win_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    }),
    // gap-based sessionization (6h gap): one user-keyed shuffle, exact
    // integer-microsecond time math, per-session rollup
    "q_sessionize" -> ((s, dir) => {
      ops.Events.sessionStats(t(s, dir, "events"), "user_id", "event_id",
        "ts", "value", gapSeconds = 21600L)
    }),
    // funnel analysis (view -> click -> purchase): greedy subsequence
    // match per user in one key-keyed aggregation — no per-step joins
    "q_funnel" -> ((s, dir) => {
      ops.Events.funnel(t(s, dir, "events"), "user_id", "event_id",
        "ts", "event_type", Seq("view", "click", "purchase"))
    }),
    // retention cohorts: first-active-day cohort x day-offset user
    // counts from one user-keyed day-set aggregation
    "q_retention" -> ((s, dir) => {
      ops.Events.retentionCohorts(t(s, dir, "events"), "user_id", "ts")
    }),
    // J8: cross-document entity intersection (shared subjects between
    // two halves of the corpus) — self-join flavored set op
    // one corpus explode + one token exchange (the q_intersect
    // max-flags shape): a token intersects iff it occurs in both
    // halves — identical set to distinct-each-half + intersect
    "q_entity_intersect" -> ((s, dir) => {
      t(s, dir, "documents")
        .select((col("doc_id") % 2 === 0).as("__even"),
          explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(max(when(col("__even"), 1)).as("__a"),
          max(when(!col("__even"), 1)).as("__b"))
        .filter(col("__a").isNotNull && col("__b").isNotNull &&
          length(col("tok")) > 0)
        .select(col("tok"))
        .orderBy(col("tok"))
    }),
    // S3+T4: JSON-LD ingest + flattening. The JSON is constructed from
    // relational columns, flattened through the kernel parser/flattener,
    // and the oracle computes the expected triples directly from the
    // source columns — an independent check of the whole JSON path.
    "q_jsonld_flatten" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val joined = c.join(n, c("c_nationkey") === n("n_nationkey"))
      val json = concat(lit("""{"@type":"Person","name":""""), col("c_name"),
        lit("""","memberOf":{"@type":"Organization","name":""""), col("n_name"),
        lit(""""}}"""))
      val flat = udf((j: String) => graft.kernel.JsonLd.flatten(j)
        .map(x => (x.subject, x.predicate, x.objectValue)))
      joined.select(col("c_custkey"), explode(flat(json)).as("t"))
        .select(col("c_custkey"), col("t._1").as("subj"),
          col("t._2").as("pred"), col("t._3").as("obj"))
    }),
    // J9: DocRED-style denormalization (posexplode + double join)
    "kg_docred_denorm" -> ((s, dir) => {
      DocRed.goldTriples(DocRed.corpus(s, pagesFor(dir) / 10).toDF)
    }),
    // A11: cross-sentence relation counts
    "kg_docred_cross_sentence" -> ((s, dir) => {
      DocRed.crossSentenceCounts(DocRed.corpus(s, pagesFor(dir) / 10).toDF)
    }),
    // J9/A11 over the reference's REAL DocRED fixture (executor-side
    // JSON parse, same denorm + dictionary mapping, oracle-checked)
    "docred_real_denorm" -> ((s, dir) => {
      DocRed.goldTriples(sources.DocRedJson.docs(s))
    }),
    "docred_real_cross_sentence" -> ((s, dir) => {
      DocRed.crossSentenceCounts(sources.DocRedJson.docs(s))
    }),
    // S1 via the REAL input format: pages round-tripped through
    // Common-Crawl-style .warc.gz shards (WARC/1.0 records, gzip from
    // java.util.zip, Content-Length-driven parse) then text-extracted —
    // the oracle compares url/length/md5 against the directly-generated
    // text, so the whole serialize→gzip→parse→extract path must be
    // byte-identical
    "kg_warc_ingest" -> ((s, dir) => {
      checkpointed(s, s"warc_ingest_${pagesFor(dir)}") {
        import s.implicits._
        val warcDir = java.nio.file.Files
          .createTempDirectory("graft_warc").toString + "/warc"
        sources.Warc.writeWarcGz(Corpus.pages(s, pagesFor(dir)), warcDir)
        sources.Warc.readPages(s, warcDir)
          .select(col("url"), col("html"))
          .as[(String, Array[Byte])]
          .map { case (url, html) =>
            val text = graft.kernel.HtmlText.extract(html)
            // code POINTS, matching DuckDB length() — String.length is
            // UTF-16 units and diverges on supplementary-plane chars
            // (ADVICE r04; the corpus is BMP-only today, belt+braces)
            (url, text.codePointCount(0, text.length).toLong, text)
          }
          .toDF("url", "n_chars", "text")
          .select(col("url"), col("n_chars"), md5(col("text")).as("text_md5"))
      }
    }),
    // A8/A9: per-case metrics + aggregate over the live pipeline
    "kg_eval_aggregate" -> ((s, dir) => {
      val (_, agg) = EvalAgg.perCaseAndAggregate(
        triplesFor(s, dir), goldFor(s, dir))
      agg
    }),
    // §2.9 under the DRIVER oracle (VERDICT r04 ask #4): a REAL
    // Trigger.AvailableNow streaming run — pages → multi-micro-batch
    // linked edge build (stream-static KB join in foreachBatch) →
    // (batch, pk) idempotent sink — read back and DuckDB-compared
    // against the batch edge derivation (streamed == batch, the
    // invariant StreamIngestSpec pins in-engine; sound because IRIs
    // are pure functions of (surface, KB)). A deterministic fifth of
    // the corpus streams (url id % 5 == 0, re-derivable in SQL) so the
    // bench cost stays query-sized; maxFilesPerTrigger=2 over 4 page
    // files forces at least two micro-batches.
    "kg_stream_parity" -> ((s, dir) => {
      s.read.parquet(s"${streamParityOutFor(s, dir)}/edges").drop("batch", "pk")
    }),
    // §2.9 node-side parity (VERDICT r05 ask #3): the SAME streaming run
    // also maintains the node table as per-micro-batch vocabulary-sized
    // deltas; their associative reduceNodes fold must equal the batch
    // node derivation (DuckDB re-derives rollup+linking+mint+node dedup
    // over the streamed corpus slice).
    "kg_stream_parity_nodes" -> ((s, dir) => {
      graft.streaming.StreamIngest.streamedNodes(s, streamParityOutFor(s, dir))
    }),
    // streaming windowed aggregation shape (computed on batch data here)
    "kg_windowed_counts" -> ((s, dir) => {
      val trip = triplesFor(s, dir).join(pagesTsFor(s, dir), Seq("url"))
      graft.streaming.StreamIngest.windowedCounts(trip)
        .select(col("window.start").as("win_start"), col("pred"), col("n_triples"))
    }),
    // KG validation stage (stage 4): per-entity violations + confidence
    "kg_validate" -> ((s, dir) => {
      Validate.validateEntities(triplesFor(s, dir))
        .select(col("url"), col("subj"), size(col("violations")).as("n_violations"),
          round(col("confidence"), 4).as("confidence"), col("valid"))
    }),
    // O1 retry-feedback diagnostics: the reference's Instructor-loop
    // error messages (extractor.rs:189-218) as a deterministic column —
    // NULL for valid entities, the exact correction prompt otherwise.
    // The corpus never produces an invalid entity, so TWO broken
    // entities are PLANTED deterministically (the 2 smallest triples,
    // re-keyed: one with a blank type, one as a surface-less Person) to
    // put the structure + missing-name templates under the oracle; the
    // low-confidence generic branch needs >= 7 warnings (impossible with
    // 4 date props) and is pinned by ValidateSpec instead
    "kg_retry_feedback" -> ((s, dir) => {
      val trip = triplesFor(s, dir)
      // the 2 smallest triples via TakeOrderedAndProject (never a
      // single-partition global window), re-keyed on the driver
      val seeds = trip.orderBy("url", "subj", "pred", "obj").limit(2).collect()
      val planted = seeds.zipWithIndex.map { case (r, i) =>
        val rn = i + 1
        org.apache.spark.sql.Row.fromSeq(trip.columns.indices.map { ci =>
          trip.columns(ci) match {
            case "url" => r.getString(ci) + "#plant" + rn
            case "subj_type" => if (rn == 1) "" else "Person"
            case "subj_surface" => if (rn == 2) "" else r.get(ci)
            case _ => r.get(ci)
          }
        })
      }
      val plantedDf = s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(planted: _*)), trip.schema)
      Validate.retryFeedback(trip.unionByName(plantedDf))
    })
  )

  /** Hand-written oracles over the driver tables, plus the generated
    * oracles (Oracles.scala) for kernel-fed and constant-embedding
    * queries. `{OUT}` placeholders are substituted by Verify. */
  def oracleSql: Map[String, String] = Oracles.all ++ Map(
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY 1""",
    "q_topk_window" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
         WHERE rn = 1""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)""",
    "q_intersect" ->
      """SELECT l_partkey FROM lineitem WHERE l_discount >= 0.05
         INTERSECT
         SELECT l_partkey FROM lineitem WHERE l_tax >= 0.04
         ORDER BY l_partkey""",
    "q_slug" ->
      """SELECT c_custkey,
         trim(regexp_replace(lower(c_name), '[^a-z0-9]+', '_', 'g'), '_') AS slug
         FROM customer""",
    "q_chunk_estimate" ->
      """SELECT doc_id,
         CASE WHEN n_chars <= 3500 THEN 1
              ELSE (n_chars + 3100 - 1) // 3100 END AS est_chunks
         FROM documents""",
    "q_dedup_exact" ->
      """SELECT doc_id,
         md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp,
         (row_number() OVER (PARTITION BY md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
                             ORDER BY doc_id ASC) = 1) AS keep
         FROM documents""",
    "q_jaccard_pairs" ->
      """SELECT a.doc_id AS id1, b.doc_id AS id2,
         round(CAST(len(list_intersect(list_distinct(string_split(a.text,' ')),
                                       list_distinct(string_split(b.text,' ')))) AS DOUBLE)
           / len(list_distinct(list_concat(string_split(a.text,' '),
                                           string_split(b.text,' ')))), 4) AS jaccard
         FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250
         WHERE length(a.text) > 0 AND length(b.text) > 0""",
    "q_text_quality" ->
      """SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
               / length(text), 4) AS punct_ratio,
         round((
           (length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ' '))) / 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ' '))) / 2
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ' '))) / 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ' '))) / 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' in ', ' '))) / 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' to ', ' '))) / 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' is ', ' '))) / 3
         ) * 1.0 / len(string_split(text, ' ')), 4) AS stopword_ratio,
         round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len
         FROM documents WHERE length(text) > 0""",
    "q_lang_id" ->
      """WITH s AS (SELECT doc_id,
           (length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ' '))) // 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' and ', ' '))) // 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' of ', ' '))) // 3 AS en,
           (length(' '||text||' ') - length(replace(' '||text||' ', ' el ', ' '))) // 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' la ', ' '))) // 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' de ', ' '))) // 3 AS es,
           (length(' '||text||' ') - length(replace(' '||text||' ', ' der ', ' '))) // 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' und ', ' '))) // 4
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' die ', ' '))) // 4 AS de,
           (length(' '||text||' ') - length(replace(' '||text||' ', ' le ', ' '))) // 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' et ', ' '))) // 3
         + (length(' '||text||' ') - length(replace(' '||text||' ', ' les ', ' '))) // 4 AS fr
         FROM documents WHERE length(text) > 0)
         SELECT doc_id,
           CASE WHEN fr >= es AND fr >= en AND fr >= de THEN 'fr'
                WHEN es >= en AND es >= de THEN 'es'
                WHEN en >= de THEN 'en'
                ELSE 'de' END AS pred_lang,
           greatest(en, es, de, fr) AS lang_score
         FROM s""",
    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')
         SELECT l.event_id, l.user_id, l.ts,
           x.asof_value, x.asof_event_id, x.asof_ts
         FROM l LEFT JOIN LATERAL (
           SELECT r.value AS asof_value, r.event_id AS asof_event_id, r.ts AS asof_ts
           FROM r WHERE r.user_id = l.user_id AND r.ts <= l.ts
           ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) x ON TRUE""",
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events)
         SELECT a.event_id AS id1, b.event_id AS id2, b.sec - a.sec AS dt_sec
         FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id < b.event_id
         WHERE abs(a.sec - b.sec) <= 300""",
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
         max(json_extract(props, '$.k')::BIGINT) AS max_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_window_events" ->
      """SELECT date_trunc('hour', ts) AS win_start, event_type,
         count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",
    // sliding windows re-derived: an event's 6 covering windows are the
    // hour-aligned starts in (ts - 6h, ts] (Spark aligns slides to the
    // epoch, and whole hours align to epoch hours)
    "q_window_sliding" ->
      """WITH x AS (SELECT date_trunc('hour', ts) - u.k * INTERVAL 1 HOUR
             AS win_start, event_type, value
           FROM events, unnest(range(6)) AS u(k))
         SELECT win_start, event_type, count(*) AS n_events,
           round(sum(value), 2) AS sum_value
         FROM x GROUP BY 1, 2""",
    "q_entity_intersect" ->
      """SELECT tok FROM (
           SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id % 2 = 0
           INTERSECT
           SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
           FROM documents WHERE doc_id % 2 = 1)
         WHERE length(tok) > 0 ORDER BY tok""",
    "q_jsonld_flatten" ->
      """SELECT c_custkey,
         trim(regexp_replace(lower(c_name), '[^a-z0-9]+', '_', 'g'), '_') AS subj,
         'memberof' AS pred, n_name AS obj
         FROM customer JOIN nation ON c_nationkey = n_nationkey""",
    "q_knn_brute" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qvec
                    FROM embeddings WHERE vec_id < 3)
         SELECT qid, vec_id, rank, cos_sim FROM (
           SELECT q.qid, e.vec_id,
             row_number() OVER (PARTITION BY q.qid
               ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) DESC,
                        e.vec_id ASC) AS rank,
             round(list_cosine_similarity(e.embedding::DOUBLE[], q.qvec::DOUBLE[]), 3) AS cos_sim
           FROM embeddings e, q) WHERE rank <= 5"""
  )
}
