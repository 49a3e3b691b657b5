package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media header codec for the multimodal column pipeline
  * (SURVEY.md §2.11 multimodal; the build env has no image/audio
  * libraries, so decode is limited to what the container formats
  * themselves define — magic numbers and fixed-layout headers, which
  * is exactly the metadata-extraction step a real pipeline runs before
  * shipping pixels/samples to a codec).
  *
  * Supported containers:
  *  - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
  *    chunk — width/height as BIG-endian int32 at offsets 16/20
  *    (PNG spec, W3C REC-png §5.2, §11.2.2);
  *  - BMP: `BM` magic, BITMAPINFOHEADER width/height as LITTLE-endian
  *    int32 at offsets 18/22;
  *  - WAV: `RIFF....WAVE` magic, fmt chunk — channels as LE uint16 at
  *    22, sample rate as LE uint32 at 24 (canonical 44-byte header).
  *
  * Anything else (short buffers, wrong magic) decodes as `unknown`
  * with -1 dimensions — decode NEVER throws, matching the quarantine
  * philosophy of the ingest path.
  */
object MediaCodec {

  private val PngMagic = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)

  // ------------------------------------------------------------- encoders

  /** Minimal valid PNG prefix: signature + IHDR chunk (33 bytes). */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(33).order(ByteOrder.BIG_ENDIAN)
    b.put(PngMagic)
    b.putInt(13) // IHDR data length
    b.put("IHDR".getBytes("US-ASCII"))
    b.putInt(width)
    b.putInt(height)
    b.put(8.toByte) // bit depth
    b.put(2.toByte) // color type: truecolor
    b.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    b.putInt(0) // CRC (not validated by the header decoder)
    b.array()
  }

  /** BMP file header + BITMAPINFOHEADER (54 bytes). */
  def encodeBmp(width: Int, height: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54) // file size (header only)
    b.putShort(0).putShort(0) // reserved
    b.putInt(54) // pixel data offset
    b.putInt(40) // DIB header size
    b.putInt(width)
    b.putInt(height)
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    b.array()
  }

  /** Canonical 44-byte WAV/RIFF header (no samples). */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int = 16): Array[Byte] = {
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36) // chunk size (header only, no data)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16) // fmt chunk size
    b.putShort(1) // PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(byteRate)
    b.putShort((channels * bitsPerSample / 8).toShort) // block align
    b.putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII"))
    b.putInt(0) // data length
    b.array()
  }

  // ------------------------------------------- pixel / sample payloads

  /** 24-bpp grayscale BMP WITH pixel data: bottom-up row order and
    * 4-byte row stride padding per the BMP spec; `pix(x, y)` supplies
    * the gray value for the TOP-DOWN logical pixel grid. */
  def encodeBmpGray(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val stride = ((3 * width + 3) / 4) * 4
    val dataLen = stride * height
    val b = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(54 + dataLen)
    b.putShort(0).putShort(0)
    b.putInt(54)
    b.putInt(40)
    b.putInt(width)
    b.putInt(height)
    b.putShort(1)
    b.putShort(24)
    b.putInt(0).putInt(dataLen).putInt(0).putInt(0).putInt(0).putInt(0)
    var row = height - 1 // BMP stores rows bottom-up
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val g = (pix(x, row) & 0xFF).toByte
        b.put(g).put(g).put(g)
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      row -= 1
    }
    b.array()
  }

  /** Decode a 24-bpp BMP into (width, height, top-down row-major gray
    * values) — undoing the bottom-up row order and stride padding. */
  def decodeBmpGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 54 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val off = bb.getInt(10)
    val w = bb.getInt(18)
    val h = bb.getInt(22)
    val stride = ((3 * w + 3) / 4) * 4
    val out = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val srcRow = h - 1 - row // stored bottom-up
      var x = 0
      while (x < w) {
        out(row * w + x) = bytes(off + srcRow * stride + 3 * x) & 0xFF
        x += 1
      }
      row += 1
    }
    (w, h, out)
  }

  /** Nearest-neighbor 2:1 downsample (one pyramid level):
    * out(x, y) = in(2x, 2y). */
  def resizeHalf(w: Int, h: Int, pix: Array[Int]): (Int, Int, Array[Int]) = {
    val ow = w / 2
    val oh = h / 2
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        out(y * ow + x) = pix(2 * y * w + 2 * x)
        x += 1
      }
      y += 1
    }
    (ow, oh, out)
  }

  /** Difference hash (dHash) rows over a (w+1) x h top-down gray
    * grid: bit x of row y is `pix(x+1, y) > pix(x, y)`, packed LSB
    * first — the standard 64-bit perceptual hash when w=8, h=8,
    * returned as h per-row bytes so callers can band them for LSH
    * candidate generation (two rows per band = 16-bit bands). Gradient
    * comparisons survive uniform brightness shifts, which is what
    * makes dHash a NEAR-dup signature rather than an exact digest. */
  def dHashRows(w: Int, h: Int, pix: Array[Int]): Array[Int] = {
    require(pix.length == (w + 1) * h,
      s"dHash needs a ${w + 1}x$h grid, got ${pix.length} pixels")
    Array.tabulate(h) { y =>
      var row = 0
      var x = 0
      while (x < w) {
        if (pix(y * (w + 1) + x + 1) > pix(y * (w + 1) + x)) row |= (1 << x)
        x += 1
      }
      row
    }
  }

  /** WAV with REAL PCM16 little-endian mono samples. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36 + dataLen)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16)
    b.putShort(1)
    b.putShort(1)
    b.putInt(sampleRate)
    b.putInt(sampleRate * 2)
    b.putShort(2)
    b.putShort(16)
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataLen)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Parse the data chunk of a canonical PCM16 mono WAV back into
    * samples (length taken from the chunk header, not the buffer). */
  def decodeWavSamples(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataLen = bb.getInt(40)
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort(44 + 2 * i); i += 1 }
    out
  }

  // -------------------------------------------------------------- decoder

  /** Header decode: (format, width, height). WAV reports
    * (sample_rate, channels) in the dimension slots. Never throws. */
  def decodeHeader(bytes: Array[Byte]): (String, Int, Int) = {
    def beInt(off: Int) =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.BIG_ENDIAN).getInt
    def leInt(off: Int) =
      ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    def leShort(off: Int) =
      ByteBuffer.wrap(bytes, off, 2).order(ByteOrder.LITTLE_ENDIAN).getShort.toInt
    def ascii(off: Int, len: Int) = new String(bytes, off, len, "US-ASCII")

    if (bytes.length >= 24 && bytes.take(8).sameElements(PngMagic) &&
      ascii(12, 4) == "IHDR")
      ("image/png", beInt(16), beInt(20))
    else if (bytes.length >= 26 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      ("image/bmp", leInt(18), leInt(22))
    else if (bytes.length >= 28 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE")
      ("audio/wav", leInt(24), leShort(22))
    else
      ("unknown", -1, -1)
  }

  // ----------------------------------------------------- fixture synthesis

  /** Deterministic per-document binary fixture: format rotates by
    * doc_id, header fields derive from (doc_id, n_chars), and a
    * (n_chars % 16)-byte payload tail exercises variable lengths. The
    * oracle recomputes the same fields arithmetically, so a decode
    * that misreads endianness or offsets fails the hash gate. */
  def synthesize(docId: Long, nChars: Long): Array[Byte] = {
    val filler = Array.fill((nChars % 16).toInt)((docId % 251).toByte)
    val header = (docId % 3) match {
      case 0 => encodePng((nChars % 640).toInt + 1, (docId % 480).toInt + 1)
      case 1 => encodeBmp((nChars % 640).toInt + 1, (docId % 480).toInt + 1)
      case _ => encodeWav(8000 * (1 + (nChars % 3)).toInt, 1 + (docId % 2).toInt)
    }
    header ++ filler
  }
}
