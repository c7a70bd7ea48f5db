package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * identification, quality scoring, token counting, document fingerprinting.
  *
  * All of these are pure Catalyst column expressions (no UDFs) so they stay
  * inside whole-stage codegen and scale linearly with input partitions — at
  * 100 TB each is a single narrow map stage over the scan, no shuffle.
  *
  * Scores that are ratios are emitted as integer fixed-point (`*1000 div n`)
  * — exact integer arithmetic, reproducible across engines (no float
  * accumulation order issues).
  */
object TextAnalysis {

  /** Whitespace word array of a single-space-normalized text column. */
  def words(text: Column): Column = split(text, " ")

  /** Stopword lists used by [[langId]] and [[quality]]. Deterministic,
    * documented sets — the language-ID heuristic is a stopword-hit argmax
    * (n-gram-free variant; same shape as classic stopword LID).
    */
  val stopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein", "zu", "den")
  val stopEs: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un", "es")

  private def inList(v: String, xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString(s"$v IN (", ", ", ")")

  /** Count of array elements contained in a literal stopword list —
    * `size(filter(words, w -> w IN (...)))`, codegen-friendly.
    */
  def stopHits(wordsCol: String, stops: Seq[String]): Column =
    expr(s"size(filter($wordsCol, w -> ${inList("w", stops)}))")

  /** Quality-scoring row per document:
    * n_words, n_chars, avg word length (x100 fixed point), stopword ratio
    * (x1000 fixed point), all exact integers.
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("w", words(col(textCol)))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("n_chars_c", length(col(textCol)).cast("long"))
      .withColumn("sum_wlen",
        expr("aggregate(transform(w, x -> length(x)), 0L, (acc, x) -> acc + x)"))
      .withColumn("avg_wlen_q2", expr("sum_wlen * 100 div n_words"))
      .withColumn("stop_hits", stopHits("w", stopEn).cast("long"))
      .withColumn("stop_ratio_q3", expr("stop_hits * 1000 div n_words"))
      // punctuation ratio: chars outside [a-z0-9 ] per char, x1000
      .withColumn("punct_ratio_q3",
        expr(s"CAST(regexp_count($textCol, '[^a-z0-9 ]') AS BIGINT) * 1000 div greatest(n_chars_c, 1)"))
      .select(col("doc_id"), col("n_words"), col("n_chars_c"),
        col("avg_wlen_q2"), col("stop_ratio_q3"), col("punct_ratio_q3"))

  /** Token counting: whitespace tokens and BPE-ish regex tokens
    * (`[a-z]+|[0-9]+` word/number pieces).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col(textCol))).cast("long").as("ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z]+|[0-9]+', 0)"))
        .cast("long").as("re_tokens"))

  /** Stopword-argmax language ID over {en, de, es}; ties resolve in fixed
    * order en > de > es (deterministic).
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("w", words(col(textCol)))
      .withColumn("s_en", stopHits("w", stopEn))
      .withColumn("s_de", stopHits("w", stopDe))
      .withColumn("s_es", stopHits("w", stopEs))
      .select(col("doc_id"),
        expr("CASE WHEN s_en >= s_de AND s_en >= s_es THEN 'en' " +
          "WHEN s_de >= s_es THEN 'de' ELSE 'es' END").as("pred_lang"),
        col("s_en").cast("long").as("s_en"))

  /** Seed vocabularies for the character-n-gram language profiles (the
    * classic n-gram LID heuristic): stopwords plus high-frequency words.
    */
  private val vocabEn = stopEn ++ Seq("with", "this", "that", "from", "have",
    "what", "which", "their", "about", "would", "there", "when", "your")
  private val vocabDe = stopDe ++ Seq("nicht", "mit", "sich", "auf", "für",
    "als", "auch", "werden", "eine", "durch", "über", "nach", "beim")
  private val vocabEs = stopEs ++ Seq("los", "del", "las", "por", "con",
    "para", "una", "este", "como", "más", "pero", "sobre", "entre")

  private def charTrigrams(s: String): Seq[String] =
    if (s.length < 3) Seq(s) else (0 to s.length - 3).map(i => s.substring(i, i + 3))

  /** Distinct space-padded character trigrams of a language's seed
    * vocabulary — a literal profile both engines can embed.
    */
  def ngramProfile(lang: String): Seq[String] = {
    val vocab = lang match {
      case "en" => vocabEn; case "de" => vocabDe; case "es" => vocabEs
      case other => throw new IllegalArgumentException(s"no profile for $other")
    }
    vocab.flatMap(w => charTrigrams(s" $w ")).distinct.sorted
  }

  /** Character-n-gram language ID: distinct trigrams of the lowercased,
    * space-padded text intersected with each language profile; argmax with
    * fixed tie order en > de > es. One narrow projection; the profiles fold
    * into the plan as array literals (set-semantics intersection, so both
    * engines agree exactly).
    */
  def langIdNgram(docs: DataFrame, textCol: String = "text"): DataFrame = {
    def litArr(xs: Seq[String]): String =
      xs.map(x => "'" + x.replace("'", "\\'") + "'").mkString("array(", ", ", ")")
    val tg = expr(
      s"""array_distinct(element_at(transform(array(concat(' ', lower($textCol), ' ')), s ->
         |  transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))), 1))""".stripMargin)
    docs
      .withColumn("tg", tg)
      .withColumn("g_en", size(expr(s"array_intersect(tg, ${litArr(ngramProfile("en"))})")))
      .withColumn("g_de", size(expr(s"array_intersect(tg, ${litArr(ngramProfile("de"))})")))
      .withColumn("g_es", size(expr(s"array_intersect(tg, ${litArr(ngramProfile("es"))})")))
      .select(col("doc_id"),
        expr("CASE WHEN g_en >= g_de AND g_en >= g_es THEN 'en' " +
          "WHEN g_de >= g_es THEN 'de' ELSE 'es' END").as("pred_lang"),
        col("g_en").cast("long").as("g_en"),
        col("g_de").cast("long").as("g_de"),
        col("g_es").cast("long").as("g_es"))
  }

  /** Content fingerprint: 64-bit hex prefix of md5 over the text — the
    * cross-engine-stable document digest used for exact dedup and lineage.
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), substring(md5(col(textCol)), 1, 16).as("fp"))

  /** Rolling polynomial (Karp–Rabin) fingerprint: h = Σ code(cᵢ)·257^(n-i)
    * mod (2^31−1), folded left-to-right so intermediates stay < 2^40 —
    * exact in int64 on any engine. Codepoints via `ascii` per char
    * (identical across engines for the BMP). Complements the md5
    * [[fingerprint]]: rolling hashes compose incrementally, so shard-level
    * fingerprints can extend streams without re-reading the prefix.
    */
  def rollingFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      expr(
        s"""aggregate(
           |  element_at(transform(array($textCol), s ->
           |    transform(sequence(1, length(s)), i -> ascii(substring(s, i, 1)))), 1),
           |  0L, (h, c) -> (h * 257 + c) % 2147483647L)""".stripMargin)
        .as("rfp"))

  /** `html_untag` (reference lib/proc.c:3460): strip tags via regex. */
  def htmlUntag(c: Column): Column = regexp_replace(c, "<[^>]*>", "")

  // ---- repetition signals (Gopher/MassiveText quality rules) -----------

  /** Run-length stats over a sorted gram array, computed with a single
    * `aggregate` fold: `best` = the multiplicity of the most frequent gram,
    * `dup` = total occurrences belonging to grams that appear more than
    * once. O(d log d) per row (the sort dominates), no shuffle, stays in
    * codegen — the 100 TB shape is one narrow map stage.
    */
  private def runStats(gramsCol: String): String =
    s"""aggregate(array_sort($gramsCol),
       |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L, 'dup', 0L),
       |  (acc, x) -> named_struct(
       |    'prev', x,
       |    'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L),
       |    'best', greatest(acc.best,
       |      IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1L, 1L)),
       |    'dup', acc.dup +
       |      IF(acc.prev IS NOT NULL AND x = acc.prev, IF(acc.run = 1L, 2L, 1L), 0L)))""".stripMargin

  /** Plain record for the kernel path of the repetition signals. */
  case class RepMetrics(n_words: Long, dup_word_frac_q3: Long, top2_cnt: Long,
      top2_frac_q3: Long, dup5_cnt: Long, dup5_frac_q3: Long)

  /** Single-document repetition metrics, identical integer math to the
    * expression form in [[withRepetitionExpr]] (split semantics match
    * Spark's `split(text, ' ')`: regex split, limit −1).
    */
  def repetitionMetrics(text: String): RepMetrics = {
    val w = text.split(" ", -1)
    val n = w.length
    val nL = math.max(n, 1).toLong
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { distinct.add(w(i)); i += 1 }
    val dupWordQ3 = (n - distinct.size).toLong * 1000L / nL
    var top2 = 0L
    if (n >= 2) {
      val m = new java.util.HashMap[String, Int]()
      i = 0
      while (i < n - 1) {
        val g = w(i) + " " + w(i + 1)
        val c = m.getOrDefault(g, 0) + 1
        m.put(g, c)
        if (c > top2) top2 = c.toLong
        i += 1
      }
    }
    val top2Q3 = top2 * 2L * 1000L / nL
    var dup5 = 0L
    if (n >= 5) {
      val m = new java.util.HashMap[String, Int]()
      i = 0
      while (i <= n - 5) {
        val g = w(i) + " " + w(i + 1) + " " + w(i + 2) + " " + w(i + 3) + " " + w(i + 4)
        m.put(g, m.getOrDefault(g, 0) + 1)
        i += 1
      }
      m.values.forEach(c => if (c > 1) dup5 += c)
    }
    val dup5Q3 = if (n >= 5) dup5 * 1000L / (n - 4) else 0L
    RepMetrics(n.toLong, dupWordQ3, top2, top2Q3, dup5, dup5Q3)
  }

  // null text -> null metrics, matching the expression form exactly
  // (split(null) propagates null there); the row-identity contract covers
  // null rows too (RepetitionSpec)
  private lazy val repKernelUdf =
    udf((s: String) => if (s == null) null else repetitionMetrics(s))

  /** Kernel form of [[withRepetitionExpr]]: one compiled-Scala pass per row
    * instead of Catalyst higher-order lambda folds (those evaluate
    * INTERPRETED — measured ~8× slower on the bench corpus). Same
    * dual-definition policy as [[Dedup]]'s hashing: the expression form is
    * the executable cross-engine spec, this is the default entry point,
    * and RepetitionSpec asserts row-identity between the two.
    */
  def withRepetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tmp = "_graft_rep_tmp"
    require(!docs.columns.contains(tmp), s"input already has a $tmp column")
    val metricCols = Seq("n_words", "dup_word_frac_q3", "top2_cnt",
      "top2_frac_q3", "dup5_cnt", "dup5_frac_q3")
    metricCols.foldLeft(docs.withColumn(tmp, repKernelUdf(col(textCol)))) {
      (df, c) => df.withColumn(c, col(s"$tmp.$c"))
    }.drop(tmp)
  }

  /** Per-document repetition signals in the style of the Gopher /
    * MassiveText quality rules (Rae et al. 2021 §A1.1), adapted to
    * word-level text (the corpus is single-line): duplicate-word fraction,
    * most-frequent-bigram coverage, and duplicate-5-gram fraction. All
    * exact integer fixed-point (×1000), so any engine reproduces them
    * bit-for-bit. Appends the metric columns to the input rows.
    * Expression (spec) form — prefer [[withRepetition]].
    */
  def withRepetitionExpr(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("w", words(col(textCol)))
      .withColumn("n_words", size(col("w")).cast("long"))
      // repeated-word occurrences beyond the first, per word
      .withColumn("dup_word_frac_q3",
        expr("(n_words - size(array_distinct(w))) * 1000 div greatest(n_words, 1L)"))
      // adjacent word bigrams / 5-grams (empty below the window size)
      .withColumn("bg", expr(
        """CASE WHEN size(w) >= 2
          |  THEN transform(sequence(1, size(w) - 1), i -> array_join(slice(w, i, 2), ' '))
          |  ELSE slice(w, 1, 0) END""".stripMargin))
      .withColumn("g5", expr(
        """CASE WHEN size(w) >= 5
          |  THEN transform(sequence(1, size(w) - 4), i -> array_join(slice(w, i, 5), ' '))
          |  ELSE slice(w, 1, 0) END""".stripMargin))
      .withColumn("top2_cnt", expr(s"${runStats("bg")}.best"))
      // fraction of words covered by the most frequent bigram (x1000)
      .withColumn("top2_frac_q3", expr("top2_cnt * 2 * 1000 div greatest(n_words, 1L)"))
      .withColumn("dup5_cnt", expr(s"${runStats("g5")}.dup"))
      // fraction of 5-gram positions whose 5-gram repeats within the doc
      .withColumn("dup5_frac_q3",
        expr("""CASE WHEN n_words IS NULL THEN CAST(NULL AS BIGINT)
               |     WHEN n_words >= 5 THEN dup5_cnt * 1000 div (n_words - 4)
               |     ELSE 0L END""".stripMargin))
      .drop("w", "bg", "g5")

  /** Repetition metric rows only (doc_id + signals). */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame =
    withRepetition(docs, textCol).select("doc_id", "n_words", "dup_word_frac_q3",
      "top2_cnt", "top2_frac_q3", "dup5_cnt", "dup5_frac_q3")

  // ---- reproducible corpus splitting & vocab ---------------------------

  /** 60-bit md5 bucket of `seed ":" id`, mod 1000 — built with the typed
    * functions API (not SQL-string splicing), so seeds containing quotes
    * and idCols needing backticks are safe.
    */
  private def md5Bucket(seed: String, idCol: String): Column =
    conv(substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))),
      1, 15), 16, 10).cast("long") % 1000

  /** Deterministic train/test assignment: bucket = the 60-bit md5 of
    * `seed ":" id` mod 1000; rows with bucket < trainPerMille are "train".
    * Engine-independent (same digest arithmetic as the dedup family),
    * stable under repartitioning and re-runs — the reproducible-split
    * primitive a training pipeline needs. Appends `bucket` and `split`.
    */
  def hashSplit(
      docs: DataFrame,
      trainPerMille: Int = 900,
      seed: String = "42",
      idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("bucket", md5Bucket(seed, idCol))
      .withColumn("split",
        when(col("bucket") < trainPerMille, "train").otherwise("test"))

  /** Deterministic per-group subsampling (corpus mixing / domain
    * reweighting): keep a row when its md5 bucket — same digest arithmetic
    * as [[hashSplit]] — falls below the group's per-mille rate. Groups
    * without an explicit rate keep `defaultPerMille`. Engine-independent
    * and stable under repartitioning; use a seed DIFFERENT from your
    * split seed so sampling and splitting stay independent.
    */
  def sampleByHash(
      docs: DataFrame,
      rates: Map[String, Int],
      groupCol: String = "source",
      defaultPerMille: Int = 1000,
      seed: String = "mix",
      idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(r)).otherwise(acc)
    }
    docs.filter(md5Bucket(seed, idCol) < rate)
  }

  /** Corpus-wide token vocabulary with counts (whitespace tokens),
    * truncated at `minCount` — the vocab/BPE-seed building stage. One
    * shuffle keyed by token with map-side partial aggregation; hot tokens
    * are exactly the partial-agg-friendly case.
    */
  def vocab(docs: DataFrame, minCount: Long = 1L, textCol: String = "text"): DataFrame =
    docs.select(explode(words(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Per-document mean unigram surprisal −(1/n)·Σ ln p(tokenᵢ) under the
    * corpus's own unigram LM (p = corpus count / corpus total) — the
    * LM-quality-filter stage of a cleaning pipeline (CCNet filters on
    * KenLM perplexity; the unigram LM is its engine-reproducible core).
    * Low = stereotypical text, high = rare-token text.
    *
    * Numerics: each TOKEN's surprisal quantizes to ×1000 fixed point
    * FIRST (`floor(−ln p · 1000)` — a handful of distinct values, stable
    * across engines), and the document mean is integer division of
    * integer sums — so float summation order can never flip a result
    * bit, the same exactness discipline as every other gate.
    *
    * LM capping (the 100 TB shape): the distinct-token set of raw web
    * text is itself heavy-tailed (URLs, hex ids, typos — billions of
    * singletons), so the LM side is capped at `maxVocab` tokens — the
    * top-K by count with ties broken by token order, so the cap is
    * deterministic and oracle-reproducible. Out-of-vocabulary tokens
    * share one OOV bucket carrying the residual probability mass
    * (p_oov = residual_count / total — the standard <unk> treatment).
    * Nothing uncapped ever reaches the driver: with `broadcastLm = true`
    * (default) at most `maxVocab` LM rows are collected and broadcast;
    * with `broadcastLm = false` the LM stays distributed and the scoring
    * join is token-keyed (the shape for LMs beyond the broadcast budget —
    * note the vocab aggregate then re-runs when the result executes,
    * since the LM cannot be pinned past this call's scope).
    */
  def unigramSurprisal(
      docs: DataFrame,
      textCol: String = "text",
      maxVocab: Int = 1 << 22,
      broadcastLm: Boolean = true): DataFrame = {
    require(maxVocab > 0, "maxVocab must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"), explode(words(col(textCol))).as("token"))
    val v = vocab(docs, minCount = 1L, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = v.agg(sum("cnt"), count(lit(1))).head()
      if (stats.isNullAt(0))
        return spark.emptyDataset[(Long, Long, Long)]
          .toDF("doc_id", "n_tok", "surprisal_q3")
      val total = stats.getLong(0)
      val capped = stats.getLong(1) > maxVocab
      val top = if (capped) v.orderBy(col("cnt").desc, col("token")).limit(maxVocab) else v
      def q3(cnt: Long): Long = math.floor(-math.log(cnt.toDouble / total) * 1000).toLong
      // every excluded token has cnt >= 1, so capped implies residual >= 1
      val oovQ3: Option[Long] =
        if (capped) Some(q3(total - top.agg(sum("cnt")).head().getLong(0))) else None
      val lmQ: DataFrame =
        if (broadcastLm)
          // bounded: at most maxVocab LM rows reach the driver
          broadcast(top.as[(String, Long)].collect().toSeq
            .map { case (t, c) => (t, q3(c)) }.toDF("token", "s_q3"))
        else
          top.select(col("token"),
            floor(-log(col("cnt").cast("double") / total.toDouble) * 1000)
              .cast("long").as("s_q3"))
      val scored = oovQ3 match {
        case None => toks.join(lmQ, Seq("token"))
        case Some(o) => toks.join(lmQ, Seq("token"), "left")
          .withColumn("s_q3", coalesce(col("s_q3"), lit(o)))
      }
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"), sum("s_q3").as("ll_q3"))
        .select(col("doc_id"), col("n_tok"),
          expr("ll_q3 div n_tok").as("surprisal_q3"))
    } finally v.unpersist()
  }

  // ---- PII scan / redaction --------------------------------------------

  /** PII patterns scanned/redacted by [[piiStats]]/[[redactPii]], in
    * redaction order (emails first — an address contains dot runs an IP
    * pattern could otherwise claim). The regex subset is RE2-compatible
    * (no backreferences/lookarounds) so SQL engines agree on matches.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b")

  /** Per-document PII hit counts, one `regexp_count` column per pattern
    * (`<name>_hits`). Narrow codegen map — the 100 TB scan shape.
    */
  def piiStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id") +: piiPatterns.map { case (name, pat) =>
      // regexp_count via the function API: a SQL-literal route would eat
      // the \b/\d escapes under default (non-escapedStringLiterals) parsing
      regexp_count(col(textCol), lit(pat)).cast("long").as(s"${name}_hits")
    }: _*)

  /** Redact every PII pattern occurrence with `replacement`, applied in
    * [[piiPatterns]] order. Returns the input rows with `textCol`
    * rewritten.
    */
  def redactPii(docs: DataFrame, textCol: String = "text",
      replacement: String = "<PII>"): DataFrame =
    docs.withColumn(textCol,
      piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat)) =>
        regexp_replace(c, pat, replacement)
      })

  private lazy val piiCompiled: Seq[java.util.regex.Pattern] =
    piiPatterns.map { case (_, p) => java.util.regex.Pattern.compile(p) }

  /** String-level twin of [[redactPii]] (for SQL UDF registration). */
  def redactPiiString(s: String, replacement: String = "<PII>"): String =
    if (s == null) null
    else piiCompiled.foldLeft(s)((acc, p) => p.matcher(acc).replaceAll(replacement))

  /** String-level total PII hit count (for SQL UDF registration). */
  def piiCountString(s: String): Long =
    if (s == null) 0L
    else piiCompiled.map { p =>
      val m = p.matcher(s); var n = 0L; while (m.find()) n += 1; n
    }.sum

  /** Gopher-rule document filter: keep rows whose repetition signals stay
    * under the given fixed-point thresholds. Returns the surviving input
    * rows with their original columns — compose ahead of dedup/tokenize in
    * a cleaning pipeline (still one narrow map stage; the filter folds into
    * the scan).
    */
  def gopherKeep(
      docs: DataFrame,
      maxDupWordQ3: Long = 300,
      maxTop2Q3: Long = 200,
      maxDup5Q3: Long = 300,
      textCol: String = "text"): DataFrame = {
    val cols = docs.columns.map(col).toIndexedSeq
    withRepetition(docs, textCol)
      .filter(col("dup_word_frac_q3") <= maxDupWordQ3 &&
        col("top2_frac_q3") <= maxTop2Q3 &&
        col("dup5_frac_q3") <= maxDup5Q3)
      .select(cols: _*)
  }
}
