package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests for the media header codec — no Spark needed. */
class MediaCodecSpec extends AnyFunSuite {

  test("png round-trip, multi-byte big-endian dims") {
    // 317/209 exercise more than one byte per dimension, so an
    // endianness mistake cannot round-trip
    assert(MediaCodec.decodeHeader(MediaCodec.encodePng(317, 209)) ==
      ("image/png", 317, 209))
    assert(MediaCodec.decodeHeader(MediaCodec.encodePng(1, 1)) ==
      ("image/png", 1, 1))
  }

  test("bmp round-trip, little-endian dims") {
    assert(MediaCodec.decodeHeader(MediaCodec.encodeBmp(640, 480)) ==
      ("image/bmp", 640, 480))
  }

  test("wav round-trip reports (sample_rate, channels)") {
    assert(MediaCodec.decodeHeader(MediaCodec.encodeWav(16000, 2)) ==
      ("audio/wav", 16000, 2))
    assert(MediaCodec.decodeHeader(MediaCodec.encodeWav(8000, 1)) ==
      ("audio/wav", 8000, 1))
  }

  test("payload tail does not confuse the decoder") {
    val withTail = MediaCodec.encodePng(10, 20) ++ Array.fill(15)(0x42.toByte)
    assert(MediaCodec.decodeHeader(withTail) == ("image/png", 10, 20))
  }

  test("garbage, short buffers and near-misses decode as unknown, never throw") {
    assert(MediaCodec.decodeHeader(Array.empty[Byte]) == ("unknown", -1, -1))
    assert(MediaCodec.decodeHeader("not a png".getBytes) == ("unknown", -1, -1))
    // PNG magic but truncated before IHDR
    assert(MediaCodec.decodeHeader(MediaCodec.encodePng(5, 5).take(12)) ==
      ("unknown", -1, -1))
    // RIFF without WAVE (e.g. AVI) is not claimed as wav
    val avi = MediaCodec.encodeWav(8000, 1)
    System.arraycopy("AVI ".getBytes("US-ASCII"), 0, avi, 8, 4)
    assert(MediaCodec.decodeHeader(avi) == ("unknown", -1, -1))
  }

  test("bmp pixel round-trip undoes bottom-up rows and stride padding") {
    // width 5 forces a 1-byte row pad (stride 16 for 15 data bytes)
    val pix = (x: Int, y: Int) => (10 * y + x) % 251
    val bytes = MediaCodec.encodeBmpGray(5, 4, pix)
    val (w, h, got) = MediaCodec.decodeBmpGray(bytes)
    assert((w, h) == (5, 4))
    for (y <- 0 until 4; x <- 0 until 5)
      assert(got(y * 5 + x) == pix(x, y), s"pixel ($x,$y)")
    // header-only decoder still classifies it
    assert(MediaCodec.decodeHeader(bytes) == ("image/bmp", 5, 4))
  }

  test("nearest-neighbor half resize picks source pixel (2x, 2y)") {
    val pix = Array.tabulate(8 * 6)(i => i)
    val (ow, oh, out) = MediaCodec.resizeHalf(8, 6, pix)
    assert((ow, oh) == (4, 3))
    for (y <- 0 until 3; x <- 0 until 4)
      assert(out(y * 4 + x) == (2 * y) * 8 + 2 * x)
  }

  test("wav pcm16 sample round-trip, length from the data chunk") {
    val samples = Array.tabulate(37)(i => (i * 117 - 2000).toShort)
    val bytes = MediaCodec.encodeWavPcm16(8000, samples)
    assert(MediaCodec.decodeWavSamples(bytes).toSeq == samples.toSeq)
    // trailing junk beyond the data chunk must be ignored
    assert(MediaCodec.decodeWavSamples(bytes ++ Array.fill(7)(0x55.toByte))
      .toSeq == samples.toSeq)
    assert(MediaCodec.decodeHeader(bytes) == ("audio/wav", 8000, 1))
  }

  test("dHash: packs gradient bits LSB-first, invariant to uniform brightness shift") {
    // 9x2 grid: row 0 strictly increasing -> all 8 bits set (255);
    // row 1 strictly decreasing -> no bits set (0)
    val pix = Array.tabulate(18) { i =>
      val y = i / 9; val x = i % 9
      if (y == 0) x * 10 else 100 - x * 10
    }
    assert(MediaCodec.dHashRows(8, 2, pix).toSeq == Seq(255, 0))
    // dHash compares neighbors, so a uniform +40 brightness shift
    // (no wrap) leaves every bit unchanged — the near-dup property
    assert(MediaCodec.dHashRows(8, 2, pix.map(_ + 40)).toSeq == Seq(255, 0))
    // a single flipped gradient changes exactly that bit
    val one = pix.clone(); one(3) = one(2) - 1 // row 0, bit 2 now falls
    assert(MediaCodec.dHashRows(8, 2, one).toSeq == Seq(255 & ~4, 0))
  }

  test("synthesize is deterministic and decodable for every format branch") {
    for (id <- 0L to 8L; nc <- Seq(37L, 640L, 1999L)) {
      val b1 = MediaCodec.synthesize(id, nc)
      val b2 = MediaCodec.synthesize(id, nc)
      assert(b1.sameElements(b2))
      val (fmt, w, h) = MediaCodec.decodeHeader(b1)
      assert(fmt != "unknown", s"id=$id nc=$nc")
      assert(w > 0 && h > 0)
      // header size + filler tail
      val headerLen = (id % 3) match { case 0 => 33; case 1 => 54; case _ => 44 }
      assert(b1.length == headerLen + (nc % 16).toInt)
    }
  }
}
