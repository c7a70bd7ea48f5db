package graft.compat

import scala.collection.mutable
import graft.analysis.{Normalizer, TokenizeMode, Tokenizers}

/** Faithful model of the reference suggest subsystem's LEARNED state
  * (reference plugins/suggest/suggest.c: func_suggest_preparer + the
  * dataset DDL in src/suggest/groonga_suggest_create_dataset.c).
  *
  * The library ships the scalable Spark analogue (graft.command.Suggest);
  * this driver-side model exists so the grntest suggest fixtures can be
  * verified event-for-event: item freq/freq2 counters, pair
  * freq0/freq1/freq2 co-occurrence counters keyed (post, pre), and the
  * per-sequence event history the complete/correct learner walks.
  */
final class SuggestDataset(val name: String) {

  // key normalization KEEPS blanks (grn_string without REMOVE_BLANK)
  private def norm(s: String): String = Normalizer.autoKeepBlank(s).text

  final class Item { var freq = 0L; var freq2 = 0L }
  /** normalized item key -> learned counters, in registration order
    * (= reference item table id order for learner-added keys).
    */
  val items = mutable.LinkedHashMap[String, Item]()

  final class Pair(val pre: String, val post: String) {
    var freq0 = 0L; var freq1 = 0L; var freq2 = 0L
  }
  /** (postKey, preKey) — the reference pair table key is post<<32|pre. */
  val pairs = mutable.LinkedHashMap[(String, String), Pair]()

  final case class Ev(item: String, submitted: Boolean, time: Double)
  val sequences = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Ev]]()

  def item(k: String): Item = items.getOrElseUpdate(k, new Item)
  def freq(k: String): Long = items.get(k).map(_.freq).getOrElse(0L)
  def freq2(k: String): Long = items.get(k).map(_.freq2).getOrElse(0L)

  private val delimit = Tokenizers.byName("TokenDelimit")

  /** One `suggest_preparer(...)` call (reference suggest.c:953
    * learner_learn): events arrive in load order; `weight` is the
    * configuration table's weight for this dataset.
    */
  def learn(itemRaw: String, typ: Option[String], seq: String,
      time: Double, weight: Long): Unit = {
    if (itemRaw == null || itemRaw.isEmpty || seq == null || seq.isEmpty) return
    val key = norm(itemRaw)
    val it = item(key)
    it.freq += weight
    val submitted = typ.exists(_.nonEmpty)
    if (submitted) {
      it.freq2 += weight
      // complete/correct learn (suggest.c:846): walk THIS sequence's
      // prior events newest-first; stop at a 60s gap; a submitted prior
      // event takes freq1 and stops, input events take freq0
      val evs = sequences.getOrElse(seq, mutable.ArrayBuffer.empty[Ev])
      var i = evs.size - 1
      var done = false
      while (i >= 0 && !done) {
        val ev = evs(i)
        if (time - ev.time >= 60.0) done = true
        else {
          val p = pairs.getOrElseUpdate((key, ev.item), new Pair(ev.item, key))
          if (ev.submitted) { p.freq1 += weight; done = true }
          else p.freq0 += weight
        }
        i -= 1
      }
      // suggest learn (suggest.c:897): TokenDelimit tokens of the key
      // REGISTER as items; the cursor stops at a token equal to the key
      // itself; freq2 counts once per distinct token
      val seen = mutable.Set[String]()
      var stop = false
      delimit.tokenize(key, TokenizeMode.Add).foreach { t =>
        if (!stop) {
          if (t.term == key) stop = true
          else {
            item(t.term)
            val p = pairs.getOrElseUpdate((key, t.term), new Pair(t.term, key))
            if (seen.add(t.term)) p.freq2 += weight
          }
        }
      }
    }
    sequences.getOrElseUpdate(seq, mutable.ArrayBuffer.empty[Ev]) +=
      Ev(key, submitted, time)
  }
}
