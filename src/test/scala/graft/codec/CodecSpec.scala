package graft.codec

import graft.core.Posting
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private def randomPostings(rnd: scala.util.Random): Vector[Posting] = {
    val n = rnd.nextInt(600)
    var doc = 0L
    Vector.fill(n) {
      doc += 1 + rnd.nextInt(1000)
      val tf = 1 + rnd.nextInt(20)
      var pos = 0
      val ps = Array.fill(tf) { pos += 1 + rnd.nextInt(50); pos }
      Posting(doc, tf, ps)
    }
  }

  test("varint roundtrip") {
    val rnd = new scala.util.Random(42)
    val values = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue) ++
      Seq.fill(200)(math.abs(rnd.nextLong()) max 0L)
    values.foreach { v =>
      val buf = new java.io.ByteArrayOutputStream()
      Varint.write(buf, v)
      val r = new Varint.Reader(buf.toByteArray)
      assert(r.read() == v, s"for $v")
      assert(!r.hasNext)
    }
  }

  test("posting block roundtrip with positions (100 random lists)") {
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val ps = randomPostings(rnd)
      val (blocks, df, cf) = PostingCodec.encode(ps.iterator, withPositions = true)
      assert(df == ps.length)
      assert(cf == ps.map(_.tf.toLong).sum)
      val decoded = PostingCodec.decode(blocks, wantPositions = true).toVector
      assert(decoded == ps)
    }
  }

  test("posting block roundtrip without positions") {
    val rnd = new scala.util.Random(11)
    (1 to 50).foreach { _ =>
      val ps = randomPostings(rnd)
      val stripped = ps.map(p => p.copy(positions = Array.emptyIntArray))
      val (blocks, _, _) = PostingCodec.encode(ps.iterator, withPositions = false)
      val decoded = PostingCodec.decode(blocks, wantPositions = false).toVector
      assert(decoded == stripped)
    }
  }

  test("block metadata: firstDoc/lastDoc/maxTf enable skipping without decode") {
    val rnd = new scala.util.Random(13)
    (1 to 50).foreach { _ =>
      val ps = randomPostings(rnd)
      val (blocks, _, _) = PostingCodec.encode(ps.iterator, withPositions = true)
      blocks.foreach { b =>
        val dec = PostingCodec.decodeBlock(b, wantPositions = true)
        assert(b.n == dec.length)
        assert(b.firstDoc == dec.head.docId)
        assert(b.lastDoc == dec.last.docId)
        assert(b.maxTf == dec.map(_.tf).max)
        assert(dec.length <= PostingCodec.BlockSize)
      }
      val bounds = blocks.map(b => (b.firstDoc, b.lastDoc))
      bounds.sliding(2).foreach {
        case Seq((_, l1), (f2, _)) => assert(l1 < f2)
        case _ =>
      }
    }
  }

  test("rejects unsorted postings") {
    val bad = Vector(Posting(5, 1, Array(1)), Posting(3, 1, Array(1)))
    assertThrows[IllegalArgumentException] {
      PostingCodec.encode(bad.iterator, withPositions = true)
    }
  }
}
