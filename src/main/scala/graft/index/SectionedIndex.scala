package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** One weighted match target: `title * 10` of a
  * `--match_columns "title * 10 || body"` spec (reference
  * lib/proc/proc_select.c:686-698; weights applied lib/expr.c:6126-6193).
  */
final case class SectionWeight(
    column: String,
    weight: Double,
    /** Raw-score ceiling applied before the weight —
      * `scorer_tf_at_most(col, max)` entries (reference
      * plugins/scorers/scorer_tf_at_most.c: min(tf, max)).
      */
    cap: Option[Double] = None,
    /** `scorer_tf_idf(col)` entries (reference lib/scorers.c:26):
      * score = max(tf · ln(N / estMatchDocs), 1), truncated.
      */
    tfIdf: Boolean = false) {

  /** Render back to the `--match_columns` entry syntax. */
  def render: String = {
    val body =
      if (tfIdf) s"scorer_tf_idf($column)"
      else cap.fold(column)(x => s"scorer_tf_at_most($column, $x)")
    if (weight == 1.0) body else s"$body * $weight"
  }
}

object MatchColumnsSpec {
  // the column argument may be a subscripted index path (Lexicon.idx[0])
  private val scorerRe = """scorer_tf_at_most\(\s*([\w.\[\]]+)\s*,\s*([\d.]+)\s*\)""".r
  private val tfIdfRe = """scorer_tf_idf\(\s*([\w.\[\]]+)\s*\)""".r

  /** Parse `"a * 10 || scorer_tf_at_most(b, 3.0) * 2 || c"` → sections with
    * weights (default 1) and optional score caps / tf-idf scorers.
    */
  def parse(s: String): Seq[SectionWeight] =
    s.split("\\|\\|").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      // split on the weight `*` only OUTSIDE parentheses
      val (body, w) = part.split("\\*(?![^(]*\\))").map(_.trim) match {
        case Array(c) => (c, 1.0)
        case Array(c, wt) => (c, wt.toDouble)
        case _ => throw new IllegalArgumentException(s"bad match_columns entry: $part")
      }
      body match {
        case scorerRe(c, cap) => SectionWeight(c, w, Some(cap.toDouble))
        case tfIdfRe(c) => SectionWeight(c, w, tfIdf = true)
        case c => SectionWeight(c, w)
      }
    }
}

/** Multi-section index — Groonga's `WITH_SECTION` (one inverted index over
  * several source columns, postings carrying a section id — reference
  * lib/grn_ii.h:39, groonga.h:322) re-expressed COLUMN-STORE-FIRST: each
  * source column gets its own complete sub-index (its own postings, norms,
  * lexicon), and a multi-column match is a weighted score-merge union across
  * the per-column results (scores add, reference res_add lib/ii.c:6029 with
  * get_weight lib/ii.c:6189).
  *
  * Why not one index with a sid stream: on a cluster, per-column sub-indexes
  * build in independent jobs, prune independently (a `title`-only query
  * never touches `body` postings — the column-pruning argument at 100 TB),
  * and keep the posting codec single-purpose. Semantics are equivalent:
  * phrases/NEAR never span sections in the reference either (positions are
  * per (doc, section)).
  */
object SectionedIndex {

  /** Build one sub-index per section column under `dir/sec_<col>`. The
    * FIRST section's docs table keeps every metadata column of `docsIn`
    * (it is the canonical docs table for select/filter/output); other
    * sections store only (docId, content).
    */
  def build(
      spark: SparkSession,
      docsIn: DataFrame,
      dir: String,
      cfg: IndexConfig,
      sections: Seq[String]
  ): Map[String, IndexManifest] = {
    require(sections.nonEmpty, "need at least one section column")
    val out = sections.zipWithIndex.map { case (c, i) =>
      val input =
        if (i == 0) {
          val others = docsIn.columns.filterNot(_ == "content").map(col)
          docsIn.select(others.toSeq :+ col(c).as("content"): _*)
        } else docsIn.select(col("docId"), col(c).as("content"))
      c -> IndexBuilder.build(spark, input, s"$dir/sec_$c", cfg)
    }.toMap
    graft.core.Fs.writeString(spark, s"$dir/_sections", sections.mkString("\n"))
    out
  }

  def open(spark: SparkSession, dir: String): SectionedReader =
    new SectionedReader(spark, dir)
}

/** Read handle over a sectioned index directory. */
final class SectionedReader(val spark: SparkSession, val dir: String) extends Serializable {

  val sectionNames: Seq[String] =
    graft.core.Fs.readString(spark, s"$dir/_sections").split("\n").toSeq.filter(_.nonEmpty)

  val readers: Map[String, IndexReader] =
    sectionNames.map(c => c -> new IndexReader(spark, s"$dir/sec_$c")).toMap

  /** The first section carries the canonical docs table (full metadata). */
  def primary: IndexReader = readers(sectionNames.head)

  def docs: DataFrame = primary.docs

  /** Resolve a match_columns spec against this index's sections. */
  def targets(spec: Seq[SectionWeight]): Seq[(IndexReader, SectionWeight)] =
    spec.map { sw =>
      val r = readers.getOrElse(sw.column,
        throw new IllegalArgumentException(
          s"no index section for column ${sw.column} (have: ${sectionNames.mkString(",")})"))
      (r, sw)
    }
}
