package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline._
import graft.kernel.{Chunker, Slug}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Naming convention: `kg_*` = the KG-construction pipeline over the
  * synthesized page corpus (FIXTURES.md §B2; no SQL oracle — gated by
  * ScalaTest P/R instead); `q_*` = relational/text operators over the
  * driver-provided parquet tables with DuckDB oracles.
  */
object SparkEntry {

  /** Pages to synthesize for kg_* queries, scaled by the sf dir. */
  def pagesFor(sfDir: String): Long =
    if (sfDir.contains("sf0.1")) 40000L
    else if (sfDir.contains("sf0.01")) 8000L
    else 2000L

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * pipeline pages→triples→eval, one row of P/R/F1. */
  def entry(spark: SparkSession): DataFrame = {
    val n = 2000L
    val predicted = Kg.pagesToTriples(Corpus.pages(spark, n)).toDF
    Eval.prfDf(predicted, Corpus.gold(spark, n).toDF)
  }

  // --- UDFs shared by oracle queries (kernel functions vs DuckDB SQL) ---
  private val slugUdf = udf((s: String) => Slug.slug(s))
  private val chunkCountUdf = udf((n: Long) =>
    if (n <= 3500L) 1L else (n + 3100L - 1L) / 3100L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------- KG pipeline (rows-only checks) ----------------
    "kg_triples" -> ((s, dir) => {
      Kg.pagesToTriples(Corpus.pages(s, pagesFor(dir)))
        .toDF.select("url", "subj", "pred", "obj")
    }),
    "kg_eval_prf" -> ((s, dir) => {
      val n = pagesFor(dir)
      Eval.prfDf(Kg.pagesToTriples(Corpus.pages(s, n)).toDF, Corpus.gold(s, n).toDF)
    }),
    "kg_nodes_edges" -> ((s, dir) => {
      val n = pagesFor(dir)
      val resolved = Kg.resolve(Kg.chunk(Kg.extractText(Corpus.pages(s, n))))
      val trip = Kg.dedup(Kg.triples(resolved))
      val linked = Linking.link(Kg.mentions(resolved), Corpus.kb(s))
      val (nodes, edges) = Graph.materialize(Linking.enrich(trip, linked))
      nodes.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
    }),
    "kg_entity_table" -> ((s, dir) => {
      val n = pagesFor(dir)
      Kg.entityTable(Kg.mentions(Kg.resolve(Kg.chunk(Kg.extractText(Corpus.pages(s, n))))))
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
    // J8 set intersection
    "q_intersect" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val a = li.filter(col("l_discount") >= 0.05).select(col("l_partkey"))
      val b = li.filter(col("l_tax") >= 0.04).select(col("l_partkey"))
      a.intersect(b).orderBy(col("l_partkey"))
    }),
    // P4 slugify (kernel UDF vs independent DuckDB regexp oracle)
    "q_slug" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"), slugUdf(col("c_name")).as("slug"))
    }),
    // T1 chunk-count estimate (chunking.rs:89-96 arithmetic)
    "q_chunk_estimate" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), chunkCountUdf(col("n_chars")).as("est_chunks"))
    })
  )

  def oracleSql: Map[String, String] = Map(
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
         FROM documents"""
  )
}
