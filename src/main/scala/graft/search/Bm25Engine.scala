package graft.search

import graft.codec.{PostingCodec, PostingBlock}
import graft.core.Posting
import graft.index.SegmentRow
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed k-heap aggregator (north-star requirement): merges per-shard
  * candidate lists into the global top-k, ordering (score desc, docId asc).
  * Rows reaching it are already shard-local top-k, so per-row O(k log k) is
  * negligible next to the scan it aggregates.
  */
final case class TopKBuf(items: Seq[ScoredDoc])

final class TopKAgg(k: Int) extends Aggregator[ScoredDoc, TopKBuf, TopKBuf] {
  private def trim(s: Seq[ScoredDoc]): Seq[ScoredDoc] =
    s.sortWith((a, b) => a.score > b.score || (a.score == b.score && a.docId < b.docId)).take(k)
  def zero: TopKBuf = TopKBuf(Seq.empty)
  def reduce(b: TopKBuf, a: ScoredDoc): TopKBuf = TopKBuf(trim(b.items :+ a))
  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = TopKBuf(trim(a.items ++ b.items))
  def finish(r: TopKBuf): TopKBuf = TopKBuf(trim(r.items))
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** Shared posting-block decode memo: repeated walks over the same blocks
  * (many queries of one batch within a shard task, or a serving node's
  * repeated hot-term queries) reuse the first decode — the decode is the
  * bandwidth-bound part of a hot-term walk. Identity-keyed on the
  * in-memory block rows. Memory is BOUNDED: once `budgetPostings` decoded
  * postings are retained (default 512k ≈ tens of MB), further blocks
  * decode transiently like the uncached path — hot blocks are touched
  * first, so the budget keeps exactly the re-decode-prone ones.
  * Thread-safe: map access is synchronized, the decode itself runs outside
  * the lock (two threads racing on a cold block decode twice; the first
  * insert wins).
  */
final class DecodeCache(withPos: Boolean, budgetPostings: Long = 512 * 1024L) {
  private val m = new java.util.IdentityHashMap[PostingBlock, Array[Posting]]()
  private var retained = 0L
  def get(b: PostingBlock): Array[Posting] = {
    var v = synchronized { m.get(b) }
    if (v == null) {
      v = PostingCodec.decodeBlock(b, withPos)
      synchronized {
        val prev = m.get(b)
        if (prev != null) v = prev
        else if (retained + v.length <= budgetPostings) {
          m.put(b, v)
          retained += v.length
        }
      }
    }
    v
  }
}

/** A per-term posting cursor over one shard with block-level skipping —
  * blocks decode lazily; firstDoc/lastDoc/maxTf headers drive both skips and
  * block-max score bounds (the chunk/dgap role of reference lib/ii.c:2659,
  * cursor chunk-skipping lib/ii.c:4182-4212).
  *
  * @param termIdx stable index of this term in the query — doc scores are
  *                summed in termIdx order in every execution path so WAND and
  *                exhaustive produce bit-identical floats (rank-identity)
  */
final class TermCursor(
    val blocks: Array[PostingBlock],
    withPos: Boolean,
    val termIdx: Int,
    val idfWeight: Double,
    bm25: Bm25,
    cache: DecodeCache = null
) {
  private var blockIdx = 0
  private var decoded: Array[Posting] = _
  private var inBlock = 0
  // suffix max of block maxTf → O(1) remaining-upper-bound
  private val suffixMaxTf: Array[Int] = {
    val a = new Array[Int](blocks.length)
    var m = 0
    var i = blocks.length - 1
    while (i >= 0) { m = math.max(m, blocks(i).maxTf); a(i) = m; i -= 1 }
    a
  }
  if (blocks.nonEmpty) loadBlock()

  private def loadBlock(): Unit = {
    decoded =
      if (cache == null) PostingCodec.decodeBlock(blocks(blockIdx), withPos)
      else cache.get(blocks(blockIdx))
    inBlock = 0
  }

  def exhausted: Boolean = blockIdx >= blocks.length
  def curDoc: Long = decoded(inBlock).docId
  def curTf: Int = decoded(inBlock).tf
  def curPositions: Array[Int] = decoded(inBlock).positions

  /** Max possible contribution from the current position onward. */
  def remainingUb: Double =
    if (exhausted) 0.0 else idfWeight * bm25.tfNormUb(suffixMaxTf(blockIdx))

  /** Tighter bound using only the current block (block-max WAND check). */
  def curBlockUb: Double =
    if (exhausted) 0.0 else idfWeight * bm25.tfNormUb(blocks(blockIdx).maxTf)

  def next(): Unit = {
    inBlock += 1
    if (inBlock >= decoded.length) {
      blockIdx += 1
      if (!exhausted) loadBlock()
    }
  }

  def advanceTo(target: Long): Unit = {
    if (exhausted || curDoc >= target) return
    if (blocks(blockIdx).lastDoc < target) {
      // skip whole blocks on lastDoc headers — no decode
      while (blockIdx < blocks.length && blocks(blockIdx).lastDoc < target) blockIdx += 1
      if (exhausted) return
      loadBlock()
    }
    var a = inBlock
    var b = decoded.length
    while (a < b) { val m = (a + b) >>> 1; if (decoded(m).docId < target) a = m + 1 else b = m }
    inBlock = a // guaranteed < length because lastDoc >= target
  }
}

object TermCursor {
  /** Build a cursor from the (possibly salted) segment rows of one term.
    * Salted (hot) sub-lists interleave docIds, so they are merged and
    * re-blocked — block skip metadata stays exact.
    */
  def fromRows(rows: Seq[SegmentRow], withPos: Boolean, termIdx: Int, idfWeight: Double, bm25: Bm25): TermCursor =
    new TermCursor(mergedBlocks(rows, withPos), withPos, termIdx, idfWeight, bm25)

  /** Merge a term's (possibly salted) segment rows into one rid-ascending
    * block list. Hoist this per (shard, term) when serving a query batch —
    * the decode+sort+re-encode of a hot term is paid once, not per query.
    */
  def mergedBlocks(rows: Seq[SegmentRow], withPos: Boolean): Array[PostingBlock] =
    if (rows.size == 1) rows.head.blocks.map(_.toBlock).toArray
    else {
      val merged = rows.iterator
        .flatMap(r => PostingCodec.decode(r.blocks.map(_.toBlock), withPos))
        .toArray.sortBy(_.docId)
      val (bs, _, _) = PostingCodec.encode(merged.iterator, withPos)
      bs.toArray
    }
}

/** Disjunctive top-k BM25 over one shard: exhaustive term-at-a-time (the
  * rank-identity oracle) and document-at-a-time block-max WAND (the scale
  * path). Both sum per-doc contributions in termIdx order so floats are
  * bit-identical; WAND prunes only when the upper bound is strictly below
  * the current threshold, preserving score ties.
  */
object Bm25Shard {

  /** THE result ordering — (score desc, docId asc) — shared by every path
    * (WAND, exhaustive, the local serving sort, specs) so a tie-break edit
    * cannot silently diverge one of them.
    */
  val resultOrdering: Ordering[ScoredDoc] = new Ordering[ScoredDoc] {
    def compare(a: ScoredDoc, b: ScoredDoc): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.docId, b.docId)
    }
  }

  private def better(a: ScoredDoc, b: ScoredDoc): Boolean =
    resultOrdering.compare(a, b) < 0

  /** min-heap by "weakness": head is the candidate to evict. */
  private val weakestFirst: Ordering[ScoredDoc] = new Ordering[ScoredDoc] {
    def compare(a: ScoredDoc, b: ScoredDoc): Int = {
      val c = java.lang.Double.compare(b.score, a.score)
      if (c != 0) c else java.lang.Long.compare(a.docId, b.docId)
    }
  }

  def exhaustive(
      cursors: Seq[TermCursor],
      docLen: Long => Int,
      avgdl: Double,
      bm25: Bm25,
      k: Int,
      deleted: Long => Boolean = _ => false
  ): Seq[ScoredDoc] = {
    // accumulate in termIdx order (cursors arrive sorted by termIdx)
    val acc = new java.util.HashMap[Long, java.lang.Double]()
    cursors.sortBy(_.termIdx).foreach { c =>
      while (!c.exhausted) {
        val d = c.curDoc
        if (!deleted(d)) {
          val s = c.idfWeight * bm25.tfNorm(c.curTf, docLen(d), avgdl)
          val prev = acc.get(d)
          acc.put(d, if (prev == null) s else prev + s)
        }
        c.next()
      }
    }
    val all = new scala.collection.mutable.ArrayBuffer[ScoredDoc](acc.size)
    val it = acc.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); all += ScoredDoc(e.getKey, e.getValue) }
    all.sortWith(better).take(k).toSeq
  }

  def wand(
      cursors0: Seq[TermCursor],
      docLen: Long => Int,
      avgdl: Double,
      bm25: Bm25,
      k: Int,
      deleted: Long => Boolean = _ => false
  ): Seq[ScoredDoc] = {
    val heap = new scala.collection.mutable.PriorityQueue[ScoredDoc]()(weakestFirst)
    var threshold = Double.NegativeInfinity

    def heapPush(s: ScoredDoc): Unit = {
      if (heap.size < k) heap.enqueue(s)
      else if (better(s, heap.head)) { heap.dequeue(); heap.enqueue(s) }
      if (heap.size == k) threshold = heap.head.score
    }

    var live: Array[TermCursor] = cursors0.filterNot(_.exhausted).toArray
    // indexed by global termIdx — a shard may hold only a subset of the
    // query's terms, so size by the max index, not the cursor count
    val maxTermIdx = if (cursors0.isEmpty) 0 else cursors0.map(_.termIdx).max + 1
    val contrib = new Array[Double](maxTermIdx)
    val matched = new Array[Boolean](maxTermIdx)

    while (live.nonEmpty) {
      java.util.Arrays.sort(live, Ordering.by[TermCursor, Long](_.curDoc))
      var ubSum = 0.0
      var pivot = -1
      var i = 0
      while (pivot < 0 && i < live.length) {
        ubSum += live(i).remainingUb
        if (heap.size < k || ubSum >= threshold) pivot = i
        i += 1
      }
      if (pivot < 0) return result(heap)
      val pivotDoc = live(pivot).curDoc
      if (live(0).curDoc == pivotDoc) {
        var cbUb = 0.0
        var j = 0
        while (j <= pivot) { cbUb += live(j).curBlockUb; j += 1 }
        if (deleted(pivotDoc)) {
          var j2 = 0
          while (j2 < live.length && live(j2).curDoc == pivotDoc) { live(j2).next(); j2 += 1 }
          live = live.filterNot(_.exhausted)
        } else if (heap.size < k || cbUb >= threshold) {
          // evaluate: gather contributions, sum in termIdx order
          java.util.Arrays.fill(matched, false)
          j = 0
          var nMatch = 0
          while (j < live.length && live(j).curDoc == pivotDoc) {
            val c = live(j)
            contrib(c.termIdx) = c.idfWeight * bm25.tfNorm(c.curTf, docLen(pivotDoc), avgdl)
            matched(c.termIdx) = true
            nMatch = j + 1
            j += 1
          }
          var score = 0.0
          var t = 0
          while (t < contrib.length) { if (matched(t)) score += contrib(t); t += 1 }
          heapPush(ScoredDoc(pivotDoc, score))
          j = 0
          while (j < nMatch) { live(j).next(); j += 1 }
        } else {
          var j2 = 0
          while (j2 < live.length && live(j2).curDoc == pivotDoc) { live(j2).next(); j2 += 1 }
        }
        live = live.filterNot(_.exhausted)
      } else {
        live(0).advanceTo(pivotDoc)
        if (live(0).exhausted) live = live.filterNot(_.exhausted)
      }
    }
    result(heap)
  }

  private def result(h: scala.collection.mutable.PriorityQueue[ScoredDoc]): Seq[ScoredDoc] =
    h.toSeq.sortWith(better)
}
