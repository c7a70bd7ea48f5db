package graft

import graft.index.DocIndex
import graft.ops.{Dedup, Similarity, TextAnalysis}
import graft.search.{Engine, NearMatch, PhraseMatch}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + training-pipeline ops), with a DuckDB-equivalent
  * `oracleSql` for everything SQL-expressible.
  *
  * Cross-engine determinism rules used throughout:
  *   - no raw floats that result from arithmetic — fixed-point integers
  *     (`*1000` / `*10000`, rounded or floor-div) or exact decimal sums;
  *   - every result has a total ORDER BY on both sides;
  *   - column names identical between the Spark result and the oracle SQL.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Embeddings plus 25 planted near-duplicates: vec_id v < 25 gets a twin
    * at v + 100000 with a deterministic per-dimension perturbation
    * (((i·7 + v) mod 11 − 5) · 0.0005, computed in double then cast to
    * float). Both engines evaluate the identical IEEE expression, so the
    * planted table is bit-equal — cos(v, twin) ≈ 0.9999, giving the
    * near-dup gates real pairs to find (the raw synthetic embeddings are
    * near-orthogonal; see the sim_cos_pairs comment).
    */
  private def plantedEmb(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").select("vec_id", "embedding")
    val pert = t(s, d, "embeddings").filter(col("vec_id") < 25)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("""transform(embedding, (x, i) ->
                CAST(cast(x AS DOUBLE) +
                     CAST((i * 7 + vec_id) % 11 - 5 AS DOUBLE) * 0.0005D AS FLOAT))""")
          .as("embedding"))
    e.unionByName(pert)
  }

  /** Documents with deterministic planted PII (see the PII oracle CTE). */
  private def piiDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("text", expr(
      """concat(text,
        |  IF(doc_id % 5 = 0, concat(' user', doc_id, '@example.com'), ''),
        |  IF(doc_id % 7 = 0, concat(' 10.0.', doc_id % 256, '.1'), ''),
        |  IF(doc_id % 11 = 0,
        |     concat(' 555-867-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0')), ''))""".stripMargin))

  /** Documents with planted within-doc repetition: doc_id % 3 == 0 rows
    * get their own first 5 words appended (mirrored verbatim in the
    * ta_repetition / ta_gopher_keep oracles).
    */
  private def repDocs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").withColumn("text",
      expr("""IF(doc_id % 3 = 0,
             |   concat(text, ' ', array_join(slice(split(text, ' '), 1, 5), ' ')),
             |   text)""".stripMargin))

  /** ScoredDoc dataset → (doc_id, score bigint), ordered. */
  private def scored(ds: org.apache.spark.sql.Dataset[graft.search.ScoredDoc]): DataFrame =
    ds.toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("long").as("score"))
      .orderBy("doc_id")

  /** ScoredDoc dataset → (doc_id, score_q4 bigint) for float-valued scores. */
  private def scoredQ4(ds: org.apache.spark.sql.Dataset[graft.search.ScoredDoc]): DataFrame =
    ds.toDF("doc_id", "s")
      .select(col("doc_id"), round(col("s") * 10000).cast("long").as("score_q4"))

  /** Flagship query on sf=0.001: build the documents index (cached),
    * answer a top-10 BM25 query through WAND; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val r = DocIndex.reader(spark, "/root/testdata/sf0.001")
    scoredQ4(Engine.bm25TopK(r, "spark dup", 10))
      .orderBy(desc("score_q4"), asc("doc_id"))
  }

  // fixed-point helpers for oracle-matching money sums (exact decimal math)
  private def cents(c: String): Column =
    (sum(col(c).cast("decimal(18,2)")) * 100).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Groonga select-family over the star schema (SURVEY.md §2) ----
    // drilldown with calc_types COUNT/SUM/MIN/MAX (grn_table_group,
    // reference lib/db.c:4111 + rset.c:20)
    "q1_drilldown_calc" -> ((s, d) => t(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_recs"),
        sum("l_quantity").cast("long").as("sum_qty"),
        min("l_quantity").cast("long").as("min_qty"),
        max("l_quantity").cast("long").as("max_qty"),
        cents("l_extendedprice").as("sum_price_cents"))
      .orderBy("l_returnflag")),

    // --sortby -price, _key + limit = partial top-k sort
    // (grn_table_sort, reference lib/db.c:11176)
    "q2_sort_topk" -> ((s, d) => t(s, d, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_cents"))),

    // between() + in_values() selector functions
    // (reference lib/proc.c:3736, 4052)
    "q3_filter_between_in" -> ((s, d) => t(s, d, "lineitem")
      .filter(col("l_quantity").between(10, 20) &&
        col("l_returnflag").isin("A", "R"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").cast("long").as("sum_qty"))
      .orderBy("l_returnflag")),

    // reference-column traversal a.b.c = join chain (reference
    // lib/db.c:5306 accessors); dims broadcast by Catalyst
    "q4_ref_join" -> ((s, d) => t(s, d, "customer")
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, d, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("n_customers"))
      .orderBy("r_name")),

    // sub_filter(ref, cond) = left-semi join (reference lib/proc.c:3530)
    "q5_sub_filter" -> ((s, d) => t(s, d, "orders")
      .join(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")),

    // drilldown with range gap = numeric bucketing
    // (GRN_TABLE_GROUP_BY_RANGE_GAP, reference lib/db.c:3751)
    "q6_range_gap" -> ((s, d) => t(s, d, "orders")
      .groupBy(floor(col("o_totalprice") / 10000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")),

    // subrec capture: top-N per group (GRN_OBJ_WITH_SUBREC,
    // reference lib/db.c:3532) as a window rank
    "q7_window_subrec" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // time-bucketed aggregation over the events table
    "q8_events_window" -> ((s, d) => t(s, d, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("hour_bucket"))
      .agg(count(lit(1)).as("n"), min("value").as("min_val"),
        max("value").as("max_val"))
      .orderBy("event_type", "hour_bucket")),

    // edit_distance() scalar (reference lib/proc/proc_fuzzy_search.c:94)
    "q9_edit_distance" -> ((s, d) => t(s, d, "nation")
      .select(col("n_name"), levenshtein(col("n_name"), lit("CHINA")).as("dist"))
      .orderBy("n_name")),

    // string_length + html_untag scalars (reference lib/proc.c:3460,
    // plugins/functions/string.c:94)
    "q10_string_ops" -> ((s, d) => t(s, d, "part")
      .select(col("p_partkey"), length(col("p_name")).as("name_len"),
        length(TextAnalysis.htmlUntag(
          concat(lit("<b>"), col("p_name"), lit("</b>")))).as("untag_len"))
      .orderBy("p_partkey")),

    // geo sort: nearest-50 by great-circle distance to a fixed center
    // (reference grn_geo_distance + sortby 'geo_distance(col, "pt")',
    // lib/geo.c); coordinates derive deterministically from doc_id in both
    // engines, output sorts on FLOORED DECAMETERS — coarse enough that a
    // ULP drift between Math trig and libm trig cannot flip a boundary
    // (meter-level floors could land exactly on an integer) — and the page
    // is TakeOrderedAndProject (no global sort)
    "q11_geo_sort" -> ((s, d) => {
      val g = t(s, d, "documents")
        .withColumn("lat", expr("(doc_id * 7919 % 18000) / 100.0 - 90.0"))
        .withColumn("lon", expr("(doc_id * 104729 % 36000) / 100.0 - 180.0"))
      g.select(col("doc_id"),
          floor(graft.functions.TextFunctions.geoDistance(
            col("lat"), col("lon"), lit(35.68), lit(139.76)) / 10.0)
            .cast("long").as("dist_dam"))
        .orderBy("dist_dam", "doc_id").limit(50)
    }),

    // ---- full-text engine over the documents index ----
    // single-term match, default scorer: _score = tf
    // (reference lib/ii.c:6984)
    "ft_term" -> ((s, d) =>
      scored(Engine.matchScores(DocIndex.reader(s, d), "spark"))),

    // result-set algebra: scores ADD on collision
    // (grn_table_setoperation, reference lib/db.c:4195)
    "ft_and" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      scored(Engine.SetOps.and(
        Engine.matchScores(r, "spark"), Engine.matchScores(r, "dup")))
    }),
    "ft_or" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      scored(Engine.SetOps.or(
        Engine.matchScores(r, "spark"), Engine.matchScores(r, "dup")))
    }),
    "ft_and_not" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      scored(Engine.SetOps.andNot(
        Engine.matchScores(r, "spark"), Engine.matchScores(r, "dup")))
    }),
    // symmetric difference (reference grn_table_difference, lib/db.c:4309:
    // common keys removed from BOTH sides); both outputs pinned via a
    // side tag in one result set
    "ft_symdiff" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      val (l, rt) = Engine.SetOps.difference(
        Engine.matchScores(r, "spark"), Engine.matchScores(r, "dup"))
      scored(l).withColumn("side", lit("a"))
        .unionByName(scored(rt).withColumn("side", lit("b")))
        .orderBy("side", "doc_id")
    }),

    // too-many-matches AND escape (reference grn_ii_select sequential
    // fallback, lib/ii.c:6536): df(batch)≈400 vs df(dup)=25 exceeds the
    // ratio, so the hot term's postings are never decoded — candidates
    // verify against the source column. The oracle is plain AND semantics,
    // proving the escape is result-identical.
    "ft_and_hot" -> ((s, d) =>
      scored(Engine.andAdaptive(DocIndex.reader(s, d), "dup", "batch"))),

    // phrase form of the sequential fallback (reference lib/ii.c:6536-6654
    // covers any query shape): the hot side is the PHRASE "table hash",
    // whose every token's df is ~16× dup's — candidates re-verify by
    // position alignment over re-tokenized content; the phrase postings
    // never decode. Score = tf(dup) + phrase occurrence count.
    "ft_and_hot_phrase" -> ((s, d) =>
      scored(Engine.andAdaptive(DocIndex.reader(s, d), "dup", "table hash"))),

    // adjuster: additive boost factor*tf for members of the boost set
    // (reference lib/proc/proc_select.c:125)
    "ft_adjust" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      scored(Engine.SetOps.adjust(
        Engine.matchScores(r, "spark"),
        Engine.matchScores(r, "dup", weight = 3.0)))
    }),

    // phrase match via position alignment (reference lib/ii.c:6941-6973)
    "ft_phrase" -> ((s, d) =>
      scored(Engine.matchScores(DocIndex.reader(s, d), "fast key"))),

    // NEAR: docs where the terms occur within a position window
    // (reference lib/ii.c:6900-6940); emitted as a presence set
    "ft_near" -> ((s, d) =>
      scored(Engine.matchScores(DocIndex.reader(s, d), "fast sort",
        kind = NearMatch(3))).select("doc_id")),

    // prefix search = lexicon expansion + OR (reference lib/pat.c:1091)
    "ft_prefix" -> ((s, d) =>
      scored(Engine.prefixSearch(DocIndex.reader(s, d), "b"))),

    // match escalation stage 2: EXACT("spar") is empty at threshold 0, so
    // UNSPLIT answers — the whole normalized query as one prefix-expanded
    // key (reference grn_ii_sel lib/ii.c:7212-7233); no word is exactly
    // "spar", only "spark" extends it, so the result is the prefix tf
    "ft_escalate" -> ((s, d) =>
      scored(graft.search.Engine.matchScoresEscalating(
        DocIndex.reader(s, d), "spar", 0L))),

    // stage 3: for "spar dat" EXACT (phrase) and UNSPLIT ("spardat"
    // after blank-removing normalization) are both empty → PARTIAL
    // AND-folds per-token prefix expansions with presence scores (1 each)
    "ft_escalate_partial" -> ((s, d) =>
      scored(graft.search.Engine.matchScoresEscalating(
        DocIndex.reader(s, d), "spar dat", 0L))),

    // index-assisted regexp: literal runs prefilter through the raw-bigram
    // index, candidates verify with rlike (reference lib/ii.c:6502)
    "ft_regexp" -> ((s, d) =>
      scored(graft.search.RegexSearch.regexpSearch(
          DocIndex.reader(s, d), Some(DocIndex.regexReader(s, d)), "sp.rk"))
        .select("doc_id")),

    // suffix search = reversed-term lexicon expansion + OR
    // (reference lib/pat.c:1150 KEY_WITH_SIS)
    "ft_suffix" -> ((s, d) =>
      scored(Engine.suffixSearch(DocIndex.reader(s, d), "er"))),

    // fuzzy search = Levenshtein lexicon expansion + OR
    // (reference lib/pat.c:1441)
    "ft_fuzzy" -> ((s, d) =>
      scored(Engine.fuzzySearch(DocIndex.reader(s, d), "part", maxDistance = 1))),

    // similar-document search (GRN_OP_SIMILAR, reference lib/ii.c:6217):
    // faithful weights w = qtf + 1048576/est, top-3 terms, score = Σ w·tf
    "ft_similar" -> ((s, d) =>
      scoredQ4(Engine.similarSearch(DocIndex.reader(s, d),
        "dup batch join window slow spark", similarityThreshold = 3))
        .orderBy("doc_id")),

    // BM25 over all matching docs (rank-identity oracle for the top-k path)
    "ft_bm25_all" -> ((s, d) => {
      val r = DocIndex.reader(s, d)
      scoredQ4(Engine.bm25TopK(r, "spark dup", r.manifest.numDocs.toInt,
        useWand = false)).orderBy("doc_id")
    }),

    // top-k BM25 through block-max WAND — the north-star query path
    "ft_bm25_topk" -> ((s, d) =>
      scoredQ4(Engine.bm25TopK(DocIndex.reader(s, d), "spark dup", 10))
        .orderBy(desc("score_q4"), asc("doc_id"))),

    // driver-local serving path (LRU postings cache + the same WAND
    // kernel, zero job submission) — must match the distributed path and
    // therefore the same oracle as ft_bm25_topk
    "ft_bm25_local_topk" -> ((s, d) =>
      scoredQ4(new graft.search.LocalServing(DocIndex.reader(s, d))
        .bm25TopKDs("spark dup", 10))
        .orderBy(desc("score_q4"), asc("doc_id"))),

    // lexicon = term dictionary with global df/cf (reference grn_ii stats)
    "ft_lexicon" -> ((s, d) => DocIndex.reader(s, d).lexicon
      .select(col("term"), col("df"), col("cf")).orderBy("term")),

    // ---- the select command surface (query DSL + drilldown + paging) ----
    // query-syntax boolean: spark AND NOT dup, OR'd with phrase "fast key";
    // sorted -_score,_id with offset paging (reference proc_select.c:530)
    "sel_query_page" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("""spark -dup OR "fast key""""),
          sortby = Seq("-_score", "_id"),
          offset = 5, limit = 15,
          outputColumns = Seq("_id", "_score")))
      res.hits.select(col("_id").as("doc_id"),
        col("_score").cast("long").as("score"))
    }),

    // --query_expander TABLE.COLUMN: the query term expands through a
    // synonym table BEFORE parsing (reference proc_select.c:34-58), so
    // `spark` with synonyms [spark, dup] evaluates exactly like the
    // hand-written OR — the oracle is plain OR semantics
    "sel_query_expand" -> ((s, d) => {
      import s.implicits._
      val syn = Seq(("spark", Seq("spark", "dup"))).toDF("key", "synonyms")
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("spark"),
          queryExpander = Some(
            graft.query.QueryExpander.fromTable(syn, "key", "synonyms")),
          sortby = Seq("_id"), limit = 1000000,
          outputColumns = Seq("_id", "_score")))
      res.hits.select(col("_id").as("doc_id"),
        col("_score").cast("long").as("score"))
    }),

    // highlight_html(content) output column: keywords come from the select
    // CONDITION (reference proc_highlight.c pulls them via
    // grn_expr_get_keywords) — on the clean lowercase corpus the oracle is
    // an exact string replace of every keyword occurrence
    "sel_highlight" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("spark"),
          sortby = Seq("_id"), limit = 1000000,
          outputColumns = Seq("_id", "highlight_html(content)")))
      res.hits.select(col("_id").as("doc_id"),
        col("`highlight_html(content)`").as("hl"))
    }),

    // query + filter (Catalyst column predicate) + scorer expression
    "sel_filter_scorer" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("spark"),
          filter = Some(col("lang") === "en"),
          scorer = Some("_score * 10 + n_chars"),
          sortby = Seq("_id"), limit = 1000000,
          outputColumns = Seq("_id", "_score")))
      res.hits.select(col("_id").as("doc_id"),
        col("_score").cast("long").as("score"))
    }),

    // drilldown with calc types over the filtered set
    // (reference lib/proc/proc_select.c:437-528)
    "sel_drilldown" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("spark"),
          drilldowns = Seq(graft.command.DrilldownSpec(
            keys = Seq("lang"),
            calcTypes = Seq("COUNT", "SUM", "MAX"),
            calcTarget = Some("n_chars"),
            sortby = Seq("-_nsubrecs"), limit = 100))))
      res.drilldowns("lang")
        .select(col("lang"), col("_nsubrecs"), col("_sum").cast("long").as("sum_chars"),
          col("_max").cast("long").as("max_chars"))
        .orderBy("lang")
    }),

    // multi-section match_columns: bare terms match BOTH the text and the
    // source sections, source weighted *5, scores merged (reference
    // lib/expr.c:6126-6193 weighted sections + res_add OR)
    "sel_match_columns" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.sectionedReader(s, d),
        graft.command.SelectParams(
          query = Some("src3 OR spark"),
          matchColumns = Seq("text", "source * 5"),
          sortby = Seq("_id"), limit = 1000000,
          outputColumns = Seq("_id", "_score")))
      res.hits.select(col("_id").as("doc_id"),
        col("_score").cast("long").as("score"))
    }),

    // column predicate inside query syntax: source:src3 + match
    "sel_colpred" -> ((s, d) => {
      val res = graft.command.Select.run(DocIndex.reader(s, d),
        graft.command.SelectParams(
          query = Some("spark source:src3"),
          sortby = Seq("_id"), limit = 1000000,
          outputColumns = Seq("_id", "_score")))
      res.hits.select(col("_id").as("doc_id"),
        col("_score").cast("long").as("score"))
    }),

    // Groonga script-syntax --filter string lowered through ScriptExpr
    // over a plain DataFrame schema (grammar lib/grn_ecmascript.lemon:40-303)
    "sel_script_filter" -> ((s, d) => {
      graft.script.DataFrameEnv.filter(t(s, d, "documents"),
        """(lang == "en" || lang == "de") &&
          | between(n_chars, 100, "include", 2000, "exclude") &&
          | (text @ "spark" || text @$ "data") &&
          | (doc_id & 3) != 1""".stripMargin)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- training-data pipeline ops over documents/embeddings ----
    "dd_exact" -> ((s, d) => Dedup.exactStats(t(s, d, "documents"))),

    "dd_minhash_bands" -> ((s, d) => Dedup.minhashBands(t(s, d, "documents"))
      .select(col("doc_id"), col("band").cast("long").as("band"), col("bucket"))
      .orderBy("doc_id", "band")),

    "dd_lsh_pairs" -> ((s, d) => Dedup.lshCandidatePairs(
      Dedup.minhashBands(t(s, d, "documents")))
      .orderBy("a", "b")),

    // the bucket-size guard through the oracle: at this corpus the largest
    // (band,bucket) holds 3 docs, so cap 2 star-links those buckets
    // (member↔min-doc_id) while size-2 buckets still all-pair — both
    // branches of the degenerate-input guard exercised against DuckDB
    "dd_lsh_pairs_capped" -> ((s, d) => Dedup.lshCandidatePairs(
      Dedup.minhashBands(t(s, d, "documents")), maxBucketSize = 2)
      .orderBy("a", "b")),

    "dd_clusters" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.dedupClusters(
        Dedup.lshCandidatePairs(Dedup.minhashBands(docs)), Some(docs))
        .orderBy("doc_id")
    }),

    // the full candidates -> jaccard >= 0.8 -> CC -> survivors composition
    "dd_survivors" -> ((s, d) =>
      Dedup.dedupCorpus(t(s, d, "documents"), thresholdQ3 = 800)
        .select("doc_id").orderBy("doc_id")),

    "dd_simhash" -> ((s, d) =>
      Dedup.simhash(t(s, d, "documents"))
        .select("doc_id", "sh_lo", "sh_hi").orderBy("doc_id")),

    // the Manku block scheme at its scale setting (6 blocks -> C(6,3)=20
    // tables with ~32-bit keys); the oracle is band-scheme-agnostic (exact
    // hamming<=3 pairs), so this gate proves the blocked path end to end
    "dd_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairsBlocked(Dedup.simhash(t(s, d, "documents")),
          maxDist = 3, blocks = 6)
        .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
        .orderBy("a", "b")),

    // LSH candidates → pair-restricted exact Jaccard: the 100 TB shape
    // (work ∝ candidates, never corpus²)
    "dd_ngram_jaccard" -> ((s, d) =>
      Dedup.nearDupPairs(t(s, d, "documents")).orderBy("a", "b")),

    "sim_topk" -> ((s, d) => Similarity.cosineTopK(t(s, d, "embeddings"), 0L, 10)),

    "sim_lsh_buckets" -> ((s, d) => Similarity.lshBuckets(t(s, d, "embeddings"))
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n")).orderBy("bucket")),

    "sim_lsh_topk" -> ((s, d) =>
      Similarity.lshTopK(t(s, d, "embeddings"), 0L, 10, planes = 4, probeDist = 2)),

    "sim_lsh_recall" -> ((s, d) =>
      Similarity.lshRecallAtK(t(s, d, "embeddings"), 0L, 10, planes = 4, probeDist = 2)),

    // planted near-dup pairs + 4-table OR-amplified sign-LSH: the synthetic
    // embeddings are near-orthogonal (max in-bucket cos ≈ 0.436), so the
    // old single-table gate at threshold 400 matched on 0 rows — vacuous.
    // plantedEmb adds 25 deterministic perturbed twins (cos ≈ 0.9999); at
    // threshold 900 exactly those pairs qualify and the gate exercises the
    // multi-table candidate union + verify end to end.
    "sim_cos_pairs" -> ((s, d) =>
      Similarity.cosinePairsAboveLsh(plantedEmb(s, d), 900, planes = 8, tables = 4)
        .orderBy("a", "b")),

    // pair-level recall of the multi-table LSH vs the exact all-pairs
    // baseline on the planted set (target >= 950; 4 tables measure 1000)
    "sim_cos_pairs_recall" -> ((s, d) =>
      Similarity.cosinePairsRecall(plantedEmb(s, d), 900, planes = 8, tables = 4)),

    "sim_quant_quality" -> ((s, d) =>
      Similarity.quantizeInt8Quality(t(s, d, "embeddings"))),

    "sim_ivf_topk" -> ((s, d) =>
      Similarity.ivfTopK(t(s, d, "embeddings"), 0L, 10, nlist = 16, nprobe = 4)),

    "sim_ivf_recall" -> ((s, d) =>
      Similarity.ivfRecallAtK(t(s, d, "embeddings"), 0L, 10, nlist = 16, nprobe = 4)),

    // the synthetic corpus text is [a-z0-9 ]-clean, so the raw punct_ratio
    // column is 0 for every row (a vacuous gate). Both engines append the
    // same deterministic punctuation (doc_id % 4 bangs) so the column
    // exercises nonzero values THROUGH the oracle, not just unit tests.
    "ta_quality" -> ((s, d) =>
      TextAnalysis.quality(t(s, d, "documents")
        .withColumn("text",
          concat(col("text"), expr("repeat('!', CAST(doc_id % 4 AS INT))"))))
        .orderBy("doc_id")),

    "ta_tokcount" -> ((s, d) =>
      TextAnalysis.tokenCounts(t(s, d, "documents")).orderBy("doc_id")),

    "ta_langid" -> ((s, d) =>
      TextAnalysis.langId(t(s, d, "documents")).orderBy("doc_id")),

    "ta_langid_ngram" -> ((s, d) =>
      TextAnalysis.langIdNgram(t(s, d, "documents")).orderBy("doc_id")),

    "ta_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(t(s, d, "documents")).orderBy("doc_id")),

    "ta_fingerprint_rolling" -> ((s, d) =>
      TextAnalysis.rollingFingerprint(t(s, d, "documents")).orderBy("doc_id")),

    // the raw synthetic corpus repeats words and bigrams but never a full
    // 5-gram (dup5 would be a vacuous column); every doc_id % 3 == 0 doc
    // gets its own first 5 words appended — the SAME deterministic
    // transform in both engines — so all three Gopher signals carry
    // nonzero values THROUGH the oracle
    "ta_repetition" -> ((s, d) =>
      TextAnalysis.repetition(repDocs(s, d)).orderBy("doc_id")),

    // the Gopher-rule filter with every threshold individually binding on
    // this corpus (dup_word drops 114 docs, top2 125, dup5 34; 261 remain)
    "ta_gopher_keep" -> ((s, d) =>
      TextAnalysis.gopherKeep(repDocs(s, d),
          maxDupWordQ3 = 650, maxTop2Q3 = 100, maxDup5Q3 = 60)
        .select("doc_id").orderBy("doc_id")),

    // GPT-3-style n-gram decontamination: src0 documents act as the
    // held-out benchmark set, the rest of the corpus is scanned for any
    // shared word 4-gram (49 of 475 docs hit at this corpus)
    "dd_contamination" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.contaminationHits(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), k = 4)
        .orderBy("doc_id")
    }),

    "dd_decontaminated" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.decontaminate(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), k = 4)
        .select("doc_id").orderBy("doc_id")
    }),

    // normalized contamination: the bench side is planted as a CASE
    // VARIANT (upper-cased) — raw shingles would match nothing; the
    // gpt3Normalize hook must recover every hit
    "dd_contamination_norm" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.contaminationHits(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0")
            .withColumn("text", upper(col("text"))),
          k = 4, normalize = Some(Dedup.gpt3Normalize))
        .orderBy("doc_id")
    }),

    // CCNet-style chunk-level dedup stats vs the whole corpus (10-word
    // non-overlapping windows; 96 of 500 docs carry duplicated chunks)
    "dd_chunk_dup" -> ((s, d) =>
      Dedup.chunkDupStats(t(s, d, "documents")).orderBy("doc_id")),

    // reproducible md5-bucket train/test split (full membership checked)
    "ta_split" -> ((s, d) =>
      TextAnalysis.hashSplit(t(s, d, "documents"))
        .select("doc_id", "bucket", "split").orderBy("doc_id")),

    // corpus vocabulary with counts, truncated at minCount
    "ta_vocab" -> ((s, d) =>
      TextAnalysis.vocab(t(s, d, "documents"), minCount = 5L).orderBy("token")),

    // corpus mixing: src0 kept at 25%, src1 at 50%, everything else whole
    "ta_sample" -> ((s, d) =>
      TextAnalysis.sampleByHash(t(s, d, "documents"),
          rates = Map("src0" -> 250, "src1" -> 500))
        .select("doc_id", "source").orderBy("doc_id")),

    // unigram-LM surprisal (the CCNet perplexity-filter core): per-token
    // surprisal quantized BEFORE summation, so the gate is integer-exact
    "ta_surprisal" -> ((s, d) =>
      TextAnalysis.unigramSurprisal(t(s, d, "documents")).orderBy("doc_id")),

    // capped-LM surprisal: top-10 vocabulary + one OOV bucket carrying the
    // residual probability mass — the heavy-tail web-vocab path (nothing
    // uncapped reaches the driver)
    "ta_surprisal_oov" -> ((s, d) =>
      TextAnalysis.unigramSurprisal(t(s, d, "documents"), maxVocab = 10)
        .orderBy("doc_id")),

    // PII scan + redaction over deterministically planted addresses
    "ta_pii" -> ((s, d) =>
      TextAnalysis.piiStats(piiDocs(s, d)).orderBy("doc_id")),

    "ta_pii_redacted" -> ((s, d) =>
      TextAnalysis.redactPii(piiDocs(s, d))
        .select("doc_id", "text").orderBy("doc_id")),

    // ---- sharded logical_* commands over day-partitioned events ----
    // (reference plugins/sharding/logical_count.rb etc; the library form
    // plans partition pruning on the _shard column — see Logical.scala)

    // logical_count over a day range, no filter: INTERIOR shards count
    // with zero columns projected (row-group metadata), only the two
    // BOUNDARY shards evaluate the ts predicate (cover_type :all vs
    // :partial in logical_count.rb)
    "log_count" -> ((s, d) => graft.command.Logical.countDF(
      s, shardedEvents(s, d), "ts",
      graft.command.Logical.LogicalRange(
        min = Some(utcTs("2024-01-05T00:00:00Z")),
        max = Some(utcTs("2024-01-20T06:30:00Z")), maxInclude = false))),

    // logical_select: exclusive min border + filter + sort + limit over
    // the pruned shard union
    "log_select" -> ((s, d) => graft.command.Logical.select(
      s, shardedEvents(s, d), "ts",
      graft.command.Logical.LogicalRange(
        min = Some(utcTs("2024-01-03T12:00:00Z")), minInclude = false,
        max = Some(utcTs("2024-01-28T00:00:00Z"))),
      filter = Some(col("event_type") === "purchase" && col("value") > 100),
      sortKeys = Seq("-value", "event_id"), limit = 40)
      .select(col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long")
          .as("value_cents"))),

    // ---- suggest family (learn) over an events-derived query log ----
    // (reference plugins/suggest: per-item frequency + within-session
    // co-occurrence; the oracle re-derives both with SQL window functions)
    "sg_items" -> ((s, d) => {
      val (items, _) = graft.command.Suggest.learn(suggestLog(s, d),
        sessionGapSec = 600000000L) // micros
      items.orderBy("item")
    }),

    "sg_pairs" -> ((s, d) => {
      val (_, pairs) = graft.command.Suggest.learn(suggestLog(s, d),
        sessionGapSec = 600000000L)
      pairs.orderBy("query", "related")
    }),

    // time-windowed full-text search over the sharded layout: per-shard
    // inverted indexes, only window-intersecting shards open, boundary
    // shards trim to the row-level instant — the reference's
    // logical_select --query pattern. tf scores are corpus-independent,
    // so the per-shard union must equal the flat-table oracle exactly.
    "lf_search" -> ((s, d) => {
      val root = shardedDocsWithTs(s, d)
      graft.command.LogicalSearch.search(s, root, "ts",
        graft.command.Logical.LogicalRange(
          min = Some(utcTs("2024-01-03T06:00:00Z")),
          max = Some(utcTs("2024-01-08T00:00:00Z")), maxInclude = false),
        "spark", idCol = "doc_id")
        .select(col("docId").as("doc_id"), col("score").cast("long").as("score"))
        .orderBy("doc_id")
    }),

    // corpus-global idf over the pruned shard set: a shard-aligned window
    // ([Jan3, Jan8) = days 2..6) makes the merged per-shard (df, N, avgdl)
    // EXACTLY the flat single-index stats over the window, so the
    // flat-table BM25 oracle must reproduce the scores (x10000 quantized)
    "lf_bm25_global" -> ((s, d) => {
      val root = shardedDocsWithTs(s, d)
      graft.command.LogicalSearch.bm25TopK(s, root, "ts",
        graft.command.Logical.LogicalRange(
          min = Some(utcTs("2024-01-03T00:00:00Z")),
          max = Some(utcTs("2024-01-08T00:00:00Z")), maxInclude = false),
        "spark dup", k = 10, idCol = "doc_id", globalIdf = true)
        .select(col("docId").as("doc_id"),
          round(col("score") * 10000).cast("long").as("score_q4"))
        .orderBy(desc("score_q4"), asc("doc_id"))
    }),

    // logical_range_filter: shard-key-ordered page (offset+limit) out of a
    // two-day window — plans as TakeOrdered over the two pruned shards
    "log_range" -> ((s, d) => graft.command.Logical.rangeFilter(
      s, shardedEvents(s, d), "ts",
      graft.command.Logical.LogicalRange(
        min = Some(utcTs("2024-01-10T00:00:00Z")),
        max = Some(utcTs("2024-01-12T00:00:00Z")), maxInclude = false),
      offset = 5, limit = 30, tiebreak = Seq("event_id"))
      .select(col("event_id"),
        expr("unix_micros(cast(ts as timestamp))").as("ts_us")))
  )

  /** Build-once day-sharded copy of `events` (`_shard=yyyyMMdd` from ts) —
    * the physical layout the logical_* commands operate on.
    */
  /** Cache tag carrying the SOURCE file's stamp so regenerated testdata
    * at the same path never gates against a stale derived copy.
    */
  private def stampTag(d: String, table: String): String = {
    val src = new java.io.File(s"$d/$table.parquet")
    val stamp =
      if (src.isDirectory)
        src.listFiles.map(f => f.lastModified ^ f.length).foldLeft(0L)(_ ^ _)
      else src.lastModified ^ src.length
    d.replaceAll("[^A-Za-z0-9.]+", "_") + "-" + java.lang.Long.toHexString(stamp)
  }

  private val logicalCache = scala.collection.mutable.Map[String, String]()
  private def shardedEvents(s: SparkSession, d: String): String = synchronized {
    logicalCache.getOrElseUpdate(d, {
      val root =
        s"${sys.props("java.io.tmpdir")}/graft-logical-v1/${stampTag(d, "events")}"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_logical")))
        graft.command.Logical.writeSharded(t(s, d, "events"), "ts", root)
      root
    })
  }

  /** Build-once day-sharded documents copy with a DERIVED timestamp
    * (2024-01-01 + doc_id%10 days + doc_id%24 hours — both engines derive
    * it identically) plus one inverted index per shard — the
    * [[graft.command.LogicalSearch]] layout.
    */
  private val lsearchCache = scala.collection.mutable.Map[String, String]()
  private def shardedDocsWithTs(s: SparkSession, d: String): String = synchronized {
    lsearchCache.getOrElseUpdate(d, {
      val root =
        s"${sys.props("java.io.tmpdir")}/graft-lsearch-v1/${stampTag(d, "documents")}"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "_logical"))) {
        val docs = t(s, d, "documents").withColumn("ts",
          expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, " +
            "CAST(doc_id % 10 AS INT), CAST(doc_id % 24 AS INT), 0, 0)"))
        graft.command.Logical.writeSharded(docs, "ts", root)
      }
      graft.command.LogicalSearch.buildIndexes(s, root, "doc_id", "text",
        graft.command.LogicalSearch.defaultConfig): Unit
      root
    })
  }

  /** JVM-timezone-independent instant literal (session tz is UTC). */
  private def utcTs(iso: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  /** Events as a suggest-learner query log: (user, ts-micros, query). No
    * (user, ts) ties in the synthetic data, so lag order is total.
    */
  private def suggestLog(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(col("user_id").as("user"),
      expr("unix_micros(cast(ts as timestamp))").as("ts"),
      col("event_type").as("query"))

  // ---- DuckDB oracles ---------------------------------------------------
  // The words CTE is the oracle-side TokenDelimit: documents.text is
  // single-space word text, so tokenization == string_split(text, ' ').
  private val W =
    "words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)"
  private def tfOf(term: String): String =
    s"(SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x = '$term')) AS tf FROM documents)"

  /** Shared MinHash/LSH CTE chain (seed 42, word-3-grams, 64 perms, 16
    * bands × 4 rows): the DuckDB re-implementation of Dedup's md5-derived
    * hashing — must stay in lockstep with Dedup.minhashSignatures/lshBands.
    */
  /** Shared CTE: Gopher repetition signals over the repDocs-augmented
    * corpus (mirrors [[graft.ops.TextAnalysis.repetition]] exactly —
    * integer fixed-point, greatest-guarded divisions).
    */
  private val REP =
    """d AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0
      |      THEN text || ' ' || array_to_string(list_slice(string_split(text, ' '), 1, 5), ' ')
      |      ELSE text END AS text FROM documents),
      |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM d),
      |bg AS (SELECT t.doc_id AS doc_id,
      |  unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS g
      |  FROM t WHERE len(w) >= 2),
      |bgc AS (SELECT doc_id, max(cnt) AS top2 FROM
      |  (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY doc_id, g) GROUP BY doc_id),
      |g5 AS (SELECT t.doc_id AS doc_id,
      |  unnest([array_to_string(list_slice(w, i, i + 4), ' ') for i in range(1, len(w) - 3)]) AS g
      |  FROM t WHERE len(w) >= 5),
      |g5c AS (SELECT doc_id, sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup5 FROM
      |  (SELECT doc_id, g, count(*) AS cnt FROM g5 GROUP BY doc_id, g) GROUP BY doc_id),
      |rep AS (SELECT t.doc_id AS doc_id, CAST(len(w) AS BIGINT) AS n_words,
      |  CAST((len(w) - len(list_distinct(w))) * 1000 // greatest(len(w), 1) AS BIGINT) AS dup_word_frac_q3,
      |  CAST(coalesce(top2, 0) AS BIGINT) AS top2_cnt,
      |  CAST(coalesce(top2, 0) * 2 * 1000 // greatest(len(w), 1) AS BIGINT) AS top2_frac_q3,
      |  CAST(coalesce(dup5, 0) AS BIGINT) AS dup5_cnt,
      |  CAST(CASE WHEN len(w) >= 5 THEN coalesce(dup5, 0) * 1000 // (len(w) - 4)
      |       ELSE 0 END AS BIGINT) AS dup5_frac_q3
      |  FROM t LEFT JOIN bgc ON bgc.doc_id = t.doc_id
      |         LEFT JOIN g5c ON g5c.doc_id = t.doc_id)""".stripMargin

  /** Shared CTE: word-4-gram shingle sets of the corpus (source <> src0)
    * and benchmark (source = src0) sides, whole-text fallback below 4
    * words (mirrors [[graft.ops.Dedup.gramsExpr]] at k = 4).
    */
  private val CONTAM =
    """t AS (SELECT doc_id, source, text, string_split(text, ' ') AS w FROM documents),
      |cg AS (SELECT t.doc_id AS doc_id, unnest(CASE WHEN len(w) >= 4
      |  THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ') for i in range(1, len(w) - 2)])
      |  ELSE [text] END) AS g FROM t WHERE source <> 'src0'),
      |bgm AS (SELECT DISTINCT unnest(CASE WHEN len(w) >= 4
      |  THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ') for i in range(1, len(w) - 2)])
      |  ELSE [text] END) AS g FROM t WHERE source = 'src0')""".stripMargin

  /** Shared CTE: documents with deterministic planted PII (the corpus
    * alphabet is [a-z0-9 ] so raw PII hits would be vacuously zero; both
    * engines append identical synthetic addresses — mirrors [[piiDocs]]).
    */
  private val PII =
    """pd AS (SELECT doc_id, text ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' user' || doc_id || '@example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' 10.0.' || (doc_id % 256) || '.1' ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0
      |    THEN ' 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |  AS text FROM documents)""".stripMargin

  private lazy val MH = {
    val (a, c) = Dedup.permCoeffs(64, 42L)
    def arr(xs: Array[Long]) = xs.mkString("[", ", ", "]")
    s"""t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
      |  THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] for i in range(1, len(w) - 1)])
      |  ELSE [text] END) AS gr FROM t),
      |hh AS (SELECT doc_id, ('0x' || substr(md5('42:' || gr), 1, 15))::BIGINT % 1073741824 AS hl,
      |  ('0x' || substr(md5('42:' || gr), 1, 15))::BIGINT // 1073741824 AS hh FROM g),
      |sigrow AS (SELECT doc_id, p, min((
      |    (((${arr(a)})[p+1] * hh) >> 31) + ((((${arr(a)})[p+1] * hh) & 2147483647) << 30)
      |    + (${arr(a)})[p+1] * hl + (${arr(c)})[p+1]) % 2305843009213693951) AS s
      |  FROM hh, range(0, 64) r(p) GROUP BY doc_id, p),""".stripMargin + "\n" +
    """sig AS (SELECT doc_id, list(s ORDER BY p) AS sig FROM sigrow GROUP BY doc_id),
      |bands AS (SELECT doc_id, band, ('0x' || substr(md5(array_to_string(
      |    list_transform(sig[band*4+1 : band*4+4], v -> v::VARCHAR), ',')), 1, 15))::BIGINT AS bucket
      |  FROM sig, range(0, 16) rb(band)),
      |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
      |  JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)""".stripMargin
  }

  /** Shared SimHash CTE chain (seed 42, word-2-grams): DuckDB twin of
    * Dedup.simhash.
    */
  private val SH =
    """t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      |g2 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
      |  THEN list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
      |  ELSE [text] END) AS gr FROM t),
      |hh AS (SELECT doc_id, ('0x' || substr(md5('42:' || gr), 1, 8))::BIGINT AS ha,
      |  ('0x' || substr(md5('42:' || gr), 9, 8))::BIGINT AS hb FROM g2),
      |bits AS (SELECT doc_id, bt, CAST(sum(CASE WHEN
      |    (((CASE WHEN bt < 32 THEN ha ELSE hb END) >> (bt % 32)) & 1) = 1
      |    THEN 1 ELSE -1 END) AS BIGINT) AS acc
      |  FROM hh, range(0, 64) r(bt) GROUP BY doc_id, bt),
      |fp AS (SELECT doc_id,
      |  CAST(sum(CASE WHEN bt < 32 AND acc > 0 THEN (1::BIGINT << (bt % 32)) ELSE 0 END) AS BIGINT) AS sh_lo,
      |  CAST(sum(CASE WHEN bt >= 32 AND acc > 0 THEN (1::BIGINT << (bt % 32)) ELSE 0 END) AS BIGINT) AS sh_hi
      |  FROM bits GROUP BY doc_id)""".stripMargin

  /** Sign-projection bucket CTE over embeddings — embeds the SAME ±1 sign
    * literals the Spark side folds into its plan (Similarity.signMatrix,
    * dims=64/planes=8/seed=42); dot quantized at 1e-6 before the sign test.
    */
  private def bkCte(planes: Int): String = {
    val sm = Similarity.signMatrix(64, planes, 42L)
    val bits = sm.zipWithIndex.map { case (row, p) =>
      val lits = row.mkString("[", ", ", "]") + "::DOUBLE[]"
      s"(CASE WHEN round(list_dot_product(embedding::DOUBLE[], $lits) * 1000000) >= 0 THEN (1::BIGINT << $p) ELSE 0 END)"
    }.mkString(" + ")
    s"bk AS (SELECT vec_id, embedding, CAST($bits AS BIGINT) AS bucket FROM embeddings)"
  }
  private lazy val BK: String = bkCte(8)

  /** IVF CTEs: seeded centroid pick (the 16 vec_ids whose md5("ivf:42:id")
    * sorts smallest, cid = rank by vec_id — identical to
    * Similarity.ivfCentroids), argmax-cosine assignment quantized at 1e-6
    * with lowest-cid tie-break, and the query's 4 nearest centroids.
    */
  private val IVF =
    """ivfc AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding::DOUBLE[] AS cv
      |  FROM (SELECT vec_id, embedding FROM embeddings
      |        ORDER BY md5('ivf:42:' || vec_id) LIMIT 16)),
      |asn AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT e.vec_id, c.cid, row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv) * 1000000) AS BIGINT) DESC, c.cid) AS rn
      |    FROM embeddings e, ivfc c) WHERE rn = 1),
      |qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
      |probes AS (
      |  SELECT c.cid FROM ivfc c, qv
      |  ORDER BY CAST(round(list_cosine_similarity(qv.qe, c.cv) * 1000000) AS BIGINT) DESC, c.cid
      |  LIMIT 4)""".stripMargin
  /** ANN gate parameters: 4 planes / hamming-≤2 multi-probe — at 500
    * vectors this scans ~69% for ~90% recall; the plane count is the
    * scale knob (each plane halves the probed fraction).
    */
  private lazy val BK4: String = bkCte(4)

  /** Planted-embeddings CTE: DuckDB twin of [[plantedEmb]] — the identical
    * IEEE double expression, cast to FLOAT, so the augmented table is
    * bit-equal across engines (DuckDB comprehension index i is 1-based,
    * hence the i−1).
    */
  private val PE =
    """pe AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000,
      |    [CAST(embedding[i] + CAST(((i - 1) * 7 + vec_id) % 11 - 5 AS DOUBLE) * 0.0005 AS FLOAT)
      |     for i in range(1, len(embedding) + 1)]
      |  FROM embeddings WHERE vec_id < 25)""".stripMargin

  /** Multi-table sign-LSH CTE over the planted table: per table t the SAME
    * ±1 literals Similarity folds into its plan (signMatrix at
    * tableSeed(42, t)), unioned with the table id.
    */
  private def bkMultiCte(planes: Int, tables: Int, src: String): String = {
    val selects = (0 until tables).map { tt =>
      val sm = Similarity.signMatrix(64, planes, Similarity.tableSeed(42L, tt))
      val bits = sm.zipWithIndex.map { case (row, p) =>
        val lits = row.mkString("[", ", ", "]") + "::DOUBLE[]"
        s"(CASE WHEN round(list_dot_product(embedding::DOUBLE[], $lits) * 1000000) >= 0 THEN (1::BIGINT << $p) ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, embedding, $tt AS t, CAST($bits AS BIGINT) AS bucket FROM $src"
    }
    s"bkm AS (${selects.mkString("\n  UNION ALL\n  ")})"
  }

  /** Shared candidate+verify CTE tail for the planted multi-table gates. */
  private lazy val COSP: String =
    s"""$PE,
       |${bkMultiCte(8, 4, "pe")},
       |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM bkm x JOIN bkm y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id),
       |lshp AS (SELECT a, b,
       |    CAST(round(list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) * 1000) AS BIGINT) AS sim_q3
       |  FROM cand JOIN pe ea ON ea.vec_id = a JOIN pe eb ON eb.vec_id = b)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q1_drilldown_calc" ->
      """SELECT l_returnflag, count(*) AS n_recs,
        | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(min(l_quantity) AS BIGINT) AS min_qty,
        | CAST(max(l_quantity) AS BIGINT) AS max_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_price_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q2_sort_topk" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q3_filter_between_in" ->
      """SELECT l_returnflag, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q4_ref_join" ->
      """SELECT r_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q5_sub_filter" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q6_range_gap" ->
      """SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q7_window_subrec" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin,

    "q8_events_window" ->
      """SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket, count(*) AS n,
        | min(value) AS min_val, max(value) AS max_val
        |FROM events GROUP BY 1, 2 ORDER BY event_type, hour_bucket""".stripMargin,

    "q9_edit_distance" ->
      "SELECT n_name, levenshtein(n_name, 'CHINA') AS dist FROM nation ORDER BY n_name",

    "q10_string_ops" ->
      """SELECT p_partkey, length(p_name) AS name_len,
        | length(regexp_replace('<b>' || p_name || '</b>', '<[^>]*>', '', 'g')) AS untag_len
        |FROM part ORDER BY p_partkey""".stripMargin,

    "ft_term" ->
      s"""WITH tf AS ${tfOf("spark")}
         |SELECT doc_id, tf AS score FROM tf WHERE tf > 0 ORDER BY doc_id""".stripMargin,

    "ft_and" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf + b.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 AND b.tf > 0 ORDER BY doc_id""".stripMargin,

    "ft_or" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf + b.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 OR b.tf > 0 ORDER BY doc_id""".stripMargin,

    "ft_and_not" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 AND b.tf = 0 ORDER BY doc_id""".stripMargin,

    "ft_adjust" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf + 3 * b.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 ORDER BY doc_id""".stripMargin,

    "q11_geo_sort" ->
      """WITH g AS (SELECT doc_id,
        |  (doc_id * 7919 % 18000) / 100.0 - 90.0 AS lat,
        |  (doc_id * 104729 % 36000) / 100.0 - 180.0 AS lon FROM documents)
        |SELECT doc_id, CAST(floor((6371009.0 * 2 * asin(sqrt(
        |    pow(sin(radians(35.68 - lat) / 2), 2) +
        |    cos(radians(lat)) * cos(radians(35.68)) *
        |      pow(sin(radians(139.76 - lon) / 2), 2)
        |  ))) / 10.0) AS BIGINT) AS dist_dam
        |FROM g ORDER BY dist_dam, doc_id LIMIT 50""".stripMargin,

    "ft_symdiff" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf AS score, 'a' AS side FROM a JOIN b USING (doc_id)
         |  WHERE a.tf > 0 AND b.tf = 0
         |UNION ALL
         |SELECT b.doc_id, b.tf AS score, 'b' AS side FROM a JOIN b USING (doc_id)
         |  WHERE b.tf > 0 AND a.tf = 0
         |ORDER BY side, doc_id""".stripMargin,

    "ft_and_hot" ->
      s"""WITH a AS ${tfOf("dup")}, b AS ${tfOf("batch")}
         |SELECT a.doc_id, a.tf + b.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 AND b.tf > 0 ORDER BY doc_id""".stripMargin,

    "ft_and_hot_phrase" ->
      s"""WITH a AS ${tfOf("dup")},
         |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |p AS (SELECT doc_id,
         |  len([i for i in range(1, len(w)) if w[i] = 'table' AND w[i+1] = 'hash']) AS pc
         | FROM t)
         |SELECT a.doc_id, a.tf + p.pc AS score FROM a JOIN p USING (doc_id)
         |WHERE a.tf > 0 AND p.pc > 0 ORDER BY doc_id""".stripMargin,

    "ft_phrase" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id,
        |  len([i for i in range(1, len(w)) if w[i] = 'fast' AND w[i+1] = 'key']) AS score
        | FROM t)
        |SELECT doc_id, score FROM p WHERE score > 0 ORDER BY doc_id""".stripMargin,

    "ft_near" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id,
        |  [i for i in range(1, len(w) + 1) if w[i] = 'fast'] AS pa,
        |  [i for i in range(1, len(w) + 1) if w[i] = 'sort'] AS pb
        | FROM t)
        |SELECT doc_id FROM p
        |WHERE len(pa) > 0 AND len(pb) > 0
        |  AND len(list_filter(pa, x ->
        |    len(list_filter(pb, y -> y >= 2 AND abs(x - y + 1) <= 3)) > 0)) > 0
        |ORDER BY doc_id""".stripMargin,

    "ft_prefix" ->
      """SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x LIKE 'b%')) AS score
        |FROM documents
        |WHERE len(list_filter(string_split(text, ' '), x -> x LIKE 'b%')) > 0
        |ORDER BY doc_id""".stripMargin,

    "ft_regexp" ->
      "SELECT doc_id FROM documents WHERE regexp_matches(text, 'sp.rk') ORDER BY doc_id",

    "ft_escalate" ->
      """SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x LIKE 'spar%')) AS score
        |FROM documents
        |WHERE len(list_filter(string_split(text, ' '), x -> x LIKE 'spar%')) > 0
        |ORDER BY doc_id""".stripMargin,

    "ft_escalate_partial" ->
      """SELECT doc_id, CAST(2 AS BIGINT) AS score FROM documents
        |WHERE len(list_filter(string_split(text, ' '), x -> x LIKE 'spar%')) > 0
        |  AND len(list_filter(string_split(text, ' '), x -> x LIKE 'dat%')) > 0
        |ORDER BY doc_id""".stripMargin,

    "ft_suffix" ->
      """SELECT doc_id, len(list_filter(string_split(text, ' '), x -> x LIKE '%er')) AS score
        |FROM documents
        |WHERE len(list_filter(string_split(text, ' '), x -> x LIKE '%er')) > 0
        |ORDER BY doc_id""".stripMargin,

    "ft_fuzzy" ->
      s"""WITH $W,
         |vocab AS (SELECT DISTINCT w FROM words WHERE levenshtein(w, 'part') <= 1)
         |SELECT doc_id, count(*) AS score FROM words
         |WHERE w IN (SELECT w FROM vocab) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ft_similar" ->
      s"""WITH $W,
         |cfx AS (SELECT w, count(*) AS cf FROM words GROUP BY w),
         |qq AS (SELECT * FROM (VALUES ('dup',1),('batch',2),('join',3),
         |  ('window',4),('slow',5),('spark',6)) t(w, qpos)),
         |qt AS (SELECT qq.w,
         |    1 + 1048576 // (CASE WHEN cf < 1 THEN 1 ELSE cf END) AS wgt
         |  FROM qq JOIN cfx USING (w)
         |  ORDER BY wgt DESC, qpos LIMIT 3),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
         |  WHERE w IN (SELECT w FROM qt) GROUP BY doc_id, w)
         |SELECT doc_id,
         | CAST(round(sum(tf * wgt) * 10000) AS BIGINT) AS score_q4
         |FROM tf JOIN qt USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "ft_bm25_all" ->
      s"""WITH $W,
         |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
         |  WHERE w IN ('spark', 'dup') GROUP BY doc_id, w),
         |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |sc AS (SELECT tf.doc_id,
         |  sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |      * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
         | FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q4
         |FROM sc ORDER BY doc_id""".stripMargin,

    "ft_bm25_topk" ->
      s"""WITH $W,
         |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
         |  WHERE w IN ('spark', 'dup') GROUP BY doc_id, w),
         |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |sc AS (SELECT tf.doc_id,
         |  sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |      * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
         | FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q4
         |FROM sc ORDER BY score_q4 DESC, doc_id LIMIT 10""".stripMargin,

    // identical math to ft_bm25_topk — the local serving path must be
    // rank- and score-identical to the distributed one
    "ft_bm25_local_topk" ->
      s"""WITH $W,
         |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
         |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
         |  WHERE w IN ('spark', 'dup') GROUP BY doc_id, w),
         |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |sc AS (SELECT tf.doc_id,
         |  sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
         |      * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
         | FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q4
         |FROM sc ORDER BY score_q4 DESC, doc_id LIMIT 10""".stripMargin,

    "ft_lexicon" ->
      s"""WITH $W
         |SELECT w AS term, count(DISTINCT doc_id) AS df, count(*) AS cf
         |FROM words GROUP BY w ORDER BY term""".stripMargin,

    "sel_query_page" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")},
         |t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |ph AS (SELECT doc_id,
         |  len([i for i in range(1, len(w)) if w[i] = 'fast' AND w[i+1] = 'key']) AS sc
         | FROM t),
         |s1 AS (SELECT a.doc_id, a.tf AS sc FROM a JOIN b USING (doc_id)
         |       WHERE a.tf > 0 AND b.tf = 0),
         |s2 AS (SELECT doc_id, sc FROM ph WHERE sc > 0),
         |u AS (SELECT coalesce(s1.doc_id, s2.doc_id) AS doc_id,
         |       coalesce(s1.sc, 0) + coalesce(s2.sc, 0) AS score
         |      FROM s1 FULL OUTER JOIN s2 ON s1.doc_id = s2.doc_id)
         |SELECT doc_id, score FROM u
         |ORDER BY score DESC, doc_id LIMIT 15 OFFSET 5""".stripMargin,

    "sel_query_expand" ->
      s"""WITH a AS ${tfOf("spark")}, b AS ${tfOf("dup")}
         |SELECT a.doc_id, a.tf + b.tf AS score FROM a JOIN b USING (doc_id)
         |WHERE a.tf > 0 OR b.tf > 0 ORDER BY doc_id""".stripMargin,

    "sel_highlight" ->
      s"""WITH a AS ${tfOf("spark")}
         |SELECT doc_id,
         | replace(d.text, 'spark', '<span class="keyword">spark</span>') AS hl
         |FROM a JOIN documents d USING (doc_id)
         |WHERE a.tf > 0 ORDER BY doc_id""".stripMargin,

    "sel_filter_scorer" ->
      s"""WITH a AS ${tfOf("spark")}
         |SELECT d.doc_id, (a.tf + 1) * 10 + d.n_chars AS score
         |FROM a JOIN documents d USING (doc_id)
         |WHERE a.tf > 0 AND d.lang = 'en' ORDER BY doc_id""".stripMargin,

    "sel_drilldown" ->
      s"""WITH a AS ${tfOf("spark")}
         |SELECT d.lang, count(*) AS _nsubrecs,
         | CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
         | CAST(max(d.n_chars) AS BIGINT) AS max_chars
         |FROM a JOIN documents d USING (doc_id) WHERE a.tf > 0
         |GROUP BY d.lang ORDER BY lang""".stripMargin,

    "sel_match_columns" ->
      s"""WITH a AS (SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x = 'src3'))
         |    + 5 * (CASE WHEN source = 'src3' THEN 1 ELSE 0 END) AS sc
         | FROM documents),
         |b AS (SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), x -> x = 'spark'))
         |    + 5 * (CASE WHEN source = 'spark' THEN 1 ELSE 0 END) AS sc
         | FROM documents)
         |SELECT a.doc_id, a.sc + b.sc AS score FROM a JOIN b USING (doc_id)
         |WHERE a.sc > 0 OR b.sc > 0 ORDER BY doc_id""".stripMargin,

    "sel_colpred" ->
      s"""WITH a AS ${tfOf("spark")}
         |SELECT d.doc_id, a.tf + 1 AS score
         |FROM a JOIN documents d USING (doc_id)
         |WHERE a.tf > 0 AND d.source = 'src3' ORDER BY doc_id""".stripMargin,

    "sel_script_filter" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE (lang = 'en' OR lang = 'de')
        |  AND n_chars >= 100 AND n_chars < 2000
        |  AND (contains(lower(text), 'spark') OR ends_with(lower(text), 'data'))
        |  AND (doc_id & 3) != 1
        |ORDER BY doc_id""".stripMargin,

    "dd_exact" ->
      "SELECT count(*) AS total, count(DISTINCT md5(text)) AS uniq FROM documents",

    "dd_minhash_bands" ->
      s"""WITH $MH
         |SELECT doc_id, band, bucket FROM bands ORDER BY doc_id, band""".stripMargin,

    "dd_lsh_pairs" ->
      s"""WITH $MH
         |SELECT a, b FROM cand ORDER BY a, b""".stripMargin,

    "dd_lsh_pairs_capped" ->
      s"""WITH $MH,
         |bsz AS (SELECT band, bucket, count(*) AS n, min(doc_id) AS rep
         |  FROM bands GROUP BY band, bucket),
         |incap AS (SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
         |  JOIN bsz s ON s.band = x.band AND s.bucket = x.bucket
         |  WHERE s.n <= 2),
         |star AS (SELECT s.rep AS a, x.doc_id AS b
         |  FROM bands x JOIN bsz s ON s.band = x.band AND s.bucket = x.bucket
         |  WHERE s.n > 2 AND x.doc_id != s.rep)
         |SELECT DISTINCT a, b
         |FROM (SELECT a, b FROM incap UNION ALL SELECT a, b FROM star)
         |ORDER BY a, b""".stripMargin,

    "dd_survivors" ->
      s"""WITH RECURSIVE $MH,
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
         |it AS (SELECT c.a, c.b, CAST(count(gb.gr) AS BIGINT) AS inter
         |  FROM cand c JOIN g ga ON ga.doc_id = c.a
         |  LEFT JOIN g gb ON gb.doc_id = c.b AND gb.gr = ga.gr
         |  GROUP BY c.a, c.b),
         |jp AS (SELECT a, b FROM it
         |  JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |  WHERE CAST(inter * 1000 // (sa.sz + sb.sz - inter) AS BIGINT) >= 800),
         |e AS (SELECT a AS src, b AS dst FROM jp UNION SELECT b, a FROM jp),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |lbl AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
         |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT doc_id FROM lbl WHERE doc_id = cluster_id ORDER BY doc_id""".stripMargin,

    "dd_clusters" ->
      s"""WITH RECURSIVE $MH,
         |e AS (SELECT a AS src, b AS dst FROM cand UNION SELECT b, a FROM cand),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |lbl AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.dst), d.doc_id)) AS cluster_id
         |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT doc_id, cluster_id FROM lbl ORDER BY doc_id""".stripMargin,

    "dd_simhash" ->
      s"""WITH $SH
         |SELECT doc_id, sh_lo, sh_hi FROM fp ORDER BY doc_id""".stripMargin,

    "dd_simhash_pairs" ->
      s"""WITH $SH,
         |banded AS (SELECT doc_id, sh_lo, sh_hi, band,
         |  CASE band WHEN 0 THEN sh_lo & 65535 WHEN 1 THEN (sh_lo >> 16) & 65535
         |       WHEN 2 THEN sh_hi & 65535 ELSE (sh_hi >> 16) & 65535 END AS v
         |  FROM fp, range(0, 4) rb(band))
         |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.sh_lo, y.sh_lo)) + bit_count(xor(x.sh_hi, y.sh_hi)) AS BIGINT) AS hamming
         |FROM banded x JOIN banded y ON x.band = y.band AND x.v = y.v AND x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.sh_lo, y.sh_lo)) + bit_count(xor(x.sh_hi, y.sh_hi)) <= 3
         |ORDER BY a, b""".stripMargin,

    "dd_ngram_jaccard" ->
      s"""WITH $MH,
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY doc_id),
         |it AS (SELECT c.a, c.b, CAST(count(gb.gr) AS BIGINT) AS inter
         |  FROM cand c JOIN g ga ON ga.doc_id = c.a
         |  LEFT JOIN g gb ON gb.doc_id = c.b AND gb.gr = ga.gr
         |  GROUP BY c.a, c.b)
         |SELECT a, b, CAST(inter * 1000 // (sa.sz + sb.sz - inter) AS BIGINT) AS jaccard_q3
         |FROM it JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
         |ORDER BY a, b""".stripMargin,

    "sim_lsh_buckets" ->
      s"""WITH $BK
         |SELECT bucket, count(*) AS n FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin,

    "sim_lsh_topk" ->
      s"""WITH $BK4,
         |q AS (SELECT embedding::DOUBLE[] AS qe, bucket AS qb FROM bk WHERE vec_id = 0)
         |SELECT e.vec_id, CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) * 1000) AS BIGINT) AS sim_q3
         |FROM bk e, q WHERE e.vec_id <> 0 AND bit_count(xor(e.bucket, q.qb)) <= 2
         |ORDER BY sim_q3 DESC, vec_id LIMIT 10""".stripMargin,

    "sim_lsh_recall" ->
      s"""WITH $BK4,
         |q AS (SELECT embedding::DOUBLE[] AS qe, bucket AS qb FROM bk WHERE vec_id = 0),
         |lsh AS (SELECT e.vec_id FROM bk e, q
         |  WHERE e.vec_id <> 0 AND bit_count(xor(e.bucket, q.qb)) <= 2
         |  ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) * 1000) AS BIGINT) DESC, e.vec_id
         |  LIMIT 10),
         |ex AS (SELECT e.vec_id FROM embeddings e, q WHERE e.vec_id <> 0
         |  ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) * 1000) AS BIGINT) DESC, e.vec_id
         |  LIMIT 10)
         |SELECT 10::BIGINT AS k, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(count(*) * 1000 // 10 AS BIGINT) AS recall_q3
         |FROM lsh JOIN ex USING (vec_id)""".stripMargin,

    "sim_cos_pairs" ->
      s"""WITH $COSP
         |SELECT a, b, sim_q3 FROM lshp WHERE sim_q3 >= 900 ORDER BY a, b""".stripMargin,

    "sim_cos_pairs_recall" ->
      s"""WITH $COSP,
         |lsh AS (SELECT a, b FROM lshp WHERE sim_q3 >= 900),
         |ex AS (SELECT x.vec_id AS a, y.vec_id AS b FROM pe x JOIN pe y ON x.vec_id < y.vec_id
         |  WHERE CAST(round(list_cosine_similarity(x.embedding::DOUBLE[], y.embedding::DOUBLE[]) * 1000) AS BIGINT) >= 900),
         |m AS (SELECT
         |  (SELECT count(*) FROM ex) AS n_exact,
         |  (SELECT count(*) FROM lsh) AS n_lsh,
         |  (SELECT count(*) FROM ex JOIN lsh USING (a, b)) AS hits)
         |SELECT CAST(n_exact AS BIGINT) AS n_exact, CAST(n_lsh AS BIGINT) AS n_lsh,
         |  CAST(hits AS BIGINT) AS hits,
         |  CAST(CASE WHEN n_exact = 0 THEN 1000 ELSE hits * 1000 // n_exact END AS BIGINT) AS recall_q3
         |FROM m""".stripMargin,

    "sim_quant_quality" ->
      """WITH q AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
        |  FROM embeddings),
        |dq AS (
        |  SELECT vec_id, e,
        |    list_transform(list_transform(e, x -> CAST(round(x / scale * 127) AS INT)),
        |                   v -> CAST(v AS DOUBLE) * scale / 127) AS d
        |  FROM q),
        |c AS (SELECT CAST(round(list_cosine_similarity(e, d) * 1000000) AS BIGINT) AS cos_q6 FROM dq)
        |SELECT count(*) AS n, min(cos_q6) AS min_cos_q6,
        |  CAST(sum(cos_q6) // count(*) AS BIGINT) AS avg_cos_q6 FROM c""".stripMargin,

    "sim_ivf_topk" ->
      s"""WITH $IVF
         |SELECT e.vec_id,
         |  CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qe) * 1000) AS BIGINT) AS sim_q3
         |FROM embeddings e JOIN asn USING (vec_id), qv
         |WHERE asn.cid IN (SELECT cid FROM probes) AND e.vec_id <> 0
         |ORDER BY sim_q3 DESC, vec_id LIMIT 10""".stripMargin,

    "sim_ivf_recall" ->
      s"""WITH $IVF,
         |ivf AS (SELECT e.vec_id FROM embeddings e JOIN asn USING (vec_id), qv
         |  WHERE asn.cid IN (SELECT cid FROM probes) AND e.vec_id <> 0
         |  ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qe) * 1000) AS BIGINT) DESC, e.vec_id
         |  LIMIT 10),
         |ex AS (SELECT e.vec_id FROM embeddings e, qv WHERE e.vec_id <> 0
         |  ORDER BY CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], qv.qe) * 1000) AS BIGINT) DESC, e.vec_id
         |  LIMIT 10)
         |SELECT 10::BIGINT AS k, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(count(*) * 1000 // 10 AS BIGINT) AS recall_q3
         |FROM ivf JOIN ex USING (vec_id)""".stripMargin,

    "sim_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        | CAST(round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe) * 1000) AS BIGINT) AS sim_q3
        |FROM embeddings e, q WHERE e.vec_id <> 0
        |ORDER BY sim_q3 DESC, vec_id LIMIT 10""".stripMargin,

    "ta_quality" ->
      """WITH t0 AS (SELECT doc_id, text || repeat('!', (doc_id % 4)::INT) AS text FROM documents),
        |t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM t0)
        |SELECT doc_id, len(w)::BIGINT AS n_words, length(text)::BIGINT AS n_chars_c,
        | (CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) * 100) // len(w) AS avg_wlen_q2,
        | (len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','on')))::BIGINT * 1000) // len(w) AS stop_ratio_q3,
        | (len(regexp_extract_all(text, '[^a-z0-9 ]'))::BIGINT * 1000) // greatest(length(text), 1) AS punct_ratio_q3
        |FROM t ORDER BY doc_id""".stripMargin,

    "ta_fingerprint_rolling" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(0::BIGINT,
        |   [ascii(text[i]) for i in range(1, length(text) + 1)]),
        |   (h, c) -> (h * 257 + c) % 2147483647) AS rfp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_tokcount" ->
      """SELECT doc_id, len(string_split(text, ' '))::BIGINT AS ws_tokens,
        | len(regexp_extract_all(text, '[a-z]+|[0-9]+'))::BIGINT AS re_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_langid" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sc AS (SELECT doc_id,
        |  len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','on'))) AS s_en,
        |  len(list_filter(w, x -> x IN ('der','die','das','und','ist','ein','zu','den'))) AS s_de,
        |  len(list_filter(w, x -> x IN ('el','la','de','y','que','en','un','es'))) AS s_es
        | FROM t)
        |SELECT doc_id,
        | CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
        |      WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS pred_lang,
        | s_en::BIGINT AS s_en
        |FROM sc ORDER BY doc_id""".stripMargin,

    "ta_langid_ngram" -> {
      def lst(lang: String) = TextAnalysis.ngramProfile(lang)
        .map(x => "'" + x.replace("'", "''") + "'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents),
         |tg AS (SELECT doc_id, list_distinct([substr(s, i, 3) for i in range(1, length(s) - 1)]) AS g FROM t),
         |sc AS (SELECT doc_id,
         |  len(list_intersect(g, ${lst("en")})) AS g_en,
         |  len(list_intersect(g, ${lst("de")})) AS g_de,
         |  len(list_intersect(g, ${lst("es")})) AS g_es
         | FROM tg)
         |SELECT doc_id,
         | CASE WHEN g_en >= g_de AND g_en >= g_es THEN 'en'
         |      WHEN g_de >= g_es THEN 'de' ELSE 'es' END AS pred_lang,
         | g_en::BIGINT AS g_en, g_de::BIGINT AS g_de, g_es::BIGINT AS g_es
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "ta_fingerprint" ->
      "SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM documents ORDER BY doc_id",

    "ta_repetition" ->
      s"""WITH $REP
         |SELECT doc_id, n_words, dup_word_frac_q3, top2_cnt, top2_frac_q3,
         |  dup5_cnt, dup5_frac_q3
         |FROM rep ORDER BY doc_id""".stripMargin,

    "ta_gopher_keep" ->
      s"""WITH $REP
         |SELECT doc_id FROM rep
         |WHERE dup_word_frac_q3 <= 650 AND top2_frac_q3 <= 100
         |  AND dup5_frac_q3 <= 60
         |ORDER BY doc_id""".stripMargin,

    "dd_contamination" ->
      s"""WITH $CONTAM
         |SELECT cg.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS hit_grams
         |FROM cg JOIN bgm USING (g) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "dd_decontaminated" ->
      s"""WITH $CONTAM
         |SELECT doc_id FROM documents
         |WHERE source <> 'src0'
         |  AND doc_id NOT IN (SELECT cg.doc_id FROM cg JOIN bgm USING (g))
         |ORDER BY doc_id""".stripMargin,

    // bench side planted upper-cased; both sides pass through the GPT-3
    // normalizer (lower, strip non-[a-z0-9 ], collapse spaces, trim)
    "dd_contamination_norm" ->
      """WITH tn AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(
        |    CASE WHEN source = 'src0' THEN upper(text) ELSE text END),
        |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS text FROM documents),
        |t2 AS (SELECT doc_id, source, text, string_split(text, ' ') AS w FROM tn),
        |cg AS (SELECT t2.doc_id AS doc_id, unnest(CASE WHEN len(w) >= 4
        |  THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ') for i in range(1, len(w) - 2)])
        |  ELSE [text] END) AS g FROM t2 WHERE source <> 'src0'),
        |bgm AS (SELECT DISTINCT unnest(CASE WHEN len(w) >= 4
        |  THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ') for i in range(1, len(w) - 2)])
        |  ELSE [text] END) AS g FROM t2 WHERE source = 'src0')
        |SELECT cg.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS hit_grams
        |FROM cg JOIN bgm USING (g) GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "ta_split" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 1000 AS bucket,
        |  CASE WHEN ('0x' || substr(md5('42:' || doc_id), 1, 15))::BIGINT % 1000 < 900
        |       THEN 'train' ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "ta_vocab" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token HAVING count(*) >= 5 ORDER BY token""".stripMargin,

    "ta_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT % 1000 <
        |  CASE WHEN source = 'src0' THEN 250
        |       WHEN source = 'src1' THEN 500 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,

    "ta_surprisal" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tt AS (SELECT sum(cnt) AS total FROM lm),
        |lmq AS (SELECT token,
        |  CAST(floor(-ln(cnt / (SELECT total FROM tt)) * 1000) AS BIGINT) AS s_q3 FROM lm)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(s_q3) // count(*) AS BIGINT) AS surprisal_q3
        |FROM tok t JOIN lmq USING (token)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "ta_surprisal_oov" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |lm AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
        |tt AS (SELECT sum(cnt) AS total FROM lm),
        |top AS (SELECT token, cnt FROM lm ORDER BY cnt DESC, token LIMIT 10),
        |oov AS (SELECT CAST(floor(-ln(
        |  ((SELECT total FROM tt) - (SELECT sum(cnt) FROM top))
        |    / (SELECT total FROM tt)) * 1000) AS BIGINT) AS s_q3),
        |lmq AS (SELECT token,
        |  CAST(floor(-ln(cnt / (SELECT total FROM tt)) * 1000) AS BIGINT) AS s_q3 FROM top)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |  CAST(sum(coalesce(l.s_q3, (SELECT s_q3 FROM oov))) // count(*) AS BIGINT) AS surprisal_q3
        |FROM tok t LEFT JOIN lmq l USING (token)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    "ta_pii" ->
      s"""WITH $PII
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS BIGINT) AS email_hits,
         |  CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS ipv4_hits,
         |  CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS BIGINT) AS phone_hits
         |FROM pd ORDER BY doc_id""".stripMargin,

    "ta_pii_redacted" ->
      s"""WITH $PII
         |SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
         |  '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<PII>', 'g'),
         |  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<PII>', 'g'),
         |  '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PII>', 'g') AS text
         |FROM pd ORDER BY doc_id""".stripMargin,

    "dd_chunk_dup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ch AS (SELECT t.doc_id AS doc_id,
        |  unnest([array_to_string(list_slice(w, j * 10 + 1, j * 10 + 10), ' ')
        |          for j in range(0, (len(w) + 9) // 10)]) AS chunk FROM t),
        |cnt AS (SELECT md5(chunk) AS digest, count(*) AS cnt FROM ch GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
        |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1000
        |       // greatest(count(*), 1) AS BIGINT) AS dup_chunk_frac_q3
        |FROM ch JOIN cnt ON cnt.digest = md5(ch.chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "sg_items" ->
      "SELECT event_type AS item, count(*) AS freq FROM events GROUP BY 1 ORDER BY item",

    "sg_pairs" ->
      """WITH l AS (SELECT user_id, epoch_us(ts) AS tsu, event_type AS query FROM events),
        |x AS (SELECT query,
        |        lag(query) OVER (PARTITION BY user_id ORDER BY tsu) AS pq,
        |        tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS gap
        |      FROM l)
        |SELECT pq AS query, query AS related, count(*) AS freq
        |FROM x WHERE pq IS NOT NULL AND pq <> query AND gap <= 600000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // lf_search runs over a day-sharded docs copy whose ts both engines
    // DERIVE identically (2024-01-01 + doc_id%10 days + doc_id%24 hours);
    // range [Jan3 06:00, Jan8) = (day 2 from 06:00) OR days 3..6
    "lf_search" ->
      """WITH t AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS score,
        |  doc_id % 10 AS d, doc_id % 24 AS h FROM documents)
        |SELECT doc_id, score FROM t
        |WHERE score > 0 AND ((d = 2 AND h >= 6) OR (d BETWEEN 3 AND 6))
        |ORDER BY doc_id""".stripMargin,

    // flat single-index BM25 over the shard-aligned window [Jan3, Jan8)
    // (= doc_id%10 IN 2..6): the merged cross-shard stats must reproduce it
    "lf_bm25_global" ->
      """WITH wd AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 BETWEEN 2 AND 6),
        |words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM wd),
        |dl AS (SELECT doc_id, count(*) AS dl FROM words GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM words
        |  WHERE w IN ('spark', 'dup') GROUP BY doc_id, w),
        |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
        |sc AS (SELECT tf.doc_id,
        |  sum(ln((n - df + 0.5) / (df + 0.5) + 1.0)
        |      * tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
        | FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN stats
        | GROUP BY tf.doc_id)
        |SELECT doc_id, CAST(round(score * 10000) AS BIGINT) AS score_q4
        |FROM sc ORDER BY score_q4 DESC, doc_id LIMIT 10""".stripMargin,

    // the logical_* gates run over a day-sharded COPY of events; shard
    // assignment never changes row content, so the flat table is the oracle
    "log_count" ->
      """SELECT count(*) AS n FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-20 06:30:00'""".stripMargin,

    "log_select" ->
      """SELECT event_id, event_type,
        | CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
        |FROM events
        |WHERE ts >  TIMESTAMP '2024-01-03 12:00:00'
        |  AND ts <= TIMESTAMP '2024-01-28 00:00:00'
        |  AND event_type = 'purchase' AND value > 100
        |ORDER BY value DESC, event_id LIMIT 40""".stripMargin,

    "log_range" ->
      """SELECT event_id, epoch_us(ts) AS ts_us FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY ts, event_id LIMIT 30 OFFSET 5""".stripMargin
  )
}
