package graft.core

/** North-star input row (BASELINE.json input_hint): one source-code file. */
final case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String
)

/** A single posting: one (document, term) pair with term frequency, the
  * token-ordinal positions of each occurrence, and the summed posting
  * weight (Groonga `grn_posting`, reference
  * include/groonga/groonga.h:590-597; sid omitted — multi-column indexes
  * are per-column sections, see SectionedIndex; positions empty when built
  * WITHOUT_POSITION; weight 0 unless built WITH_WEIGHT from a weighted
  * vector — reference `tscore` is the sum of matched posting weights,
  * lib/ii.c:6984).
  */
final case class Posting(docId: Long, tf: Int, positions: Array[Int], weight: Int = 0) {
  override def toString = s"Posting($docId,$tf,${positions.mkString("[", ",", "]")},w=$weight)"
  override def equals(o: Any): Boolean = o match {
    case p: Posting =>
      p.docId == docId && p.tf == tf && p.weight == weight &&
        java.util.Arrays.equals(p.positions, positions)
    case _ => false
  }
  override def hashCode: Int =
    ((docId.## * 31 + tf) * 31 + weight) * 31 + java.util.Arrays.hashCode(positions)
}

object Sha256 {
  def hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(64)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    sb.toString
  }
}
