package graft.search

import graft.analysis.Tokenizers
import graft.index.IndexReader
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GRN_OP_TERM_EXTRACT — extract lexicon terms occurring in a given text
  * (reference grn_ii_term_extract lib/ii.c:6358-6500, driven by
  * grn_pat_lcp_search lib/pat.c:1180): walk the normalized text; at each
  * position take the LONGEST lexicon term that prefixes the remaining text,
  * emit it, and advance past it (greedy LCP segmentation); otherwise advance
  * one character.
  *
  * Driver-side extraction uses a hash set per candidate length (the PAT-trie
  * role); the distributed variant broadcasts the same structure and maps a
  * whole column — lexicons are MBs even for 10^12-doc corpora (zipf), so a
  * broadcast dictionary is the 100 TB-correct shape (same pattern as a
  * broadcast join of a dimension table).
  */
object TermExtract {

  /** Compiled extraction dictionary (broadcastable). */
  final class Dict(terms: Iterable[String]) extends Serializable {
    private val set = new java.util.HashSet[String]()
    private var maxLenV = 0
    terms.foreach { t =>
      if (t.nonEmpty) { set.add(t); if (t.length > maxLenV) maxLenV = t.length }
    }
    def maxLen: Int = maxLenV
    def contains(s: String): Boolean = set.contains(s)

    /** Greedy longest-match extraction over `text` (already normalized the
      * same way the lexicon terms were). Returns (term, charOffset) pairs.
      */
    def extract(text: String): Seq[(String, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer[(String, Int)]()
      var i = 0
      val n = text.length
      while (i < n) {
        var l = math.min(maxLenV, n - i)
        var hit: String = null
        while (hit == null && l >= 1) {
          val cand = text.substring(i, i + l)
          if (set.contains(cand)) hit = cand
          l -= 1
        }
        if (hit != null) { out += ((hit, i)); i += hit.length }
        else i += 1
      }
      out.toSeq
    }
  }

  def dictOf(reader: IndexReader): Dict = {
    import reader.spark.implicits._
    new Dict(reader.lexicon.select("term").as[String].collect())
  }

  /** Extract lexicon terms from one text (normalized with the index's
    * analysis chain first, like the reference normalizes the query).
    */
  def termExtract(reader: IndexReader, text: String): Seq[(String, Int)] = {
    val norm = Tokenizers.byName(reader.manifest.tokenizerName).normalizer(text).text
    dictOf(reader).extract(norm)
  }

  /** Distributed column variant: one row per extracted (id, term, offset). */
  def termExtractColumn(reader: IndexReader, df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = reader.spark
    import spark.implicits._
    val dictB = spark.sparkContext.broadcast(dictOf(reader))
    val tokName = reader.manifest.tokenizerName
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val dict = dictB.value
        val norm = Tokenizers.byName(tokName).normalizer
        it.flatMap { case (id, text) =>
          dict.extract(norm(text).text).map { case (t, off) => (id, t, off) }
        }
      }
      .toDF(idCol, "term", "offset")
  }

  /** Join-based TERM_EXTRACT for lexicons too large to broadcast (the
    * 10⁸+-term regime where [[dictOf]]'s driver collect dies): candidate
    * substrings of each text (every offset, lengths 1..max term length)
    * shuffle-join the lexicon TABLE on term — no driver materialization —
    * then the identical greedy longest-match resolution runs per doc over
    * its (small) hit list. Output ≡ [[termExtractColumn]]
    * (TermExtractSpec pins equality); keep the broadcast form as the
    * small-dictionary fast path.
    *
    * Cost shape: candidates are O(chars × maxTermLen) rows — the standard
    * text-vs-dictionary join; maxTermLen is one lexicon aggregate (a
    * scalar, not a collect). The per-doc resolution group is only the
    * lexicon HITS of that doc, bounded by its length.
    */
  def termExtractColumnPartitioned(reader: IndexReader, df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = reader.spark
    import spark.implicits._
    // candidate substrings are built with Java UTF-16 indices, so the cap
    // must be in UTF-16 units; Spark length() counts CODEPOINTS, which
    // undercounts terms containing supplementary characters (a 10-codepoint
    // emoji term is 20 UTF-16 units) and would make them unmatchable.
    // octet_length (UTF-8 bytes) >= UTF-16 units for every codepoint
    // (BMP: 1-3 bytes vs 1 unit; supplementary: 4 bytes vs 2 units), so it
    // is a safe upper bound — over-generation only adds candidates the
    // lexicon join drops.
    val maxLenRow = reader.lexicon.agg(max(octet_length(col("term")))).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    val tokName = reader.manifest.tokenizerName
    val cands = df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val norm = Tokenizers.byName(tokName).normalizer
        it.flatMap { case (id, text) =>
          val t = norm(if (text == null) "" else text).text
          // iterators, not a strict comprehension: a 10 MB doc × maxLen 40
          // would otherwise materialize ~400M candidate tuples in one task
          Iterator.range(0, t.length).flatMap { i =>
            Iterator.range(1, math.min(maxLen, t.length - i) + 1)
              .map(l => (id, i, t.substring(i, i + l)))
          }
        }
      }
      .toDF("__id", "off", "term")
    cands.join(reader.lexicon.select("term"), Seq("term"))
      .select(col("__id"), col("off"), col("term"))
      .as[(Long, Int, String)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        // greedy longest-match over the sorted hit offsets: equivalent to
        // the char walk — positions inside a taken match are skipped, and
        // the first uncovered offset with a hit is where the walk would
        // match next (unmatched positions between hits advance by one
        // character in the walk, changing nothing)
        val byOff = new java.util.TreeMap[Int, String]()
        it.foreach { case (_, off, term) =>
          val cur = byOff.get(off)
          if (cur == null || term.length > cur.length) byOff.put(off, term): Unit
        }
        val out = scala.collection.mutable.ArrayBuffer[(Long, String, Int)]()
        var nextFree = 0
        byOff.forEach { (off, term) =>
          if (off >= nextFree) { out += ((id, term, off)); nextFree = off + term.length }
        }
        out.iterator
      }
      .toDF(idCol, "term", "offset")
  }
}
