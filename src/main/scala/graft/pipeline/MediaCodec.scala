package graft.pipeline

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Real byte-format codecs for the multimodal pipeline — no external
  * libraries, just the published layouts of four public formats:
  *
  *  - BMP (Windows bitmap, BITMAPINFOHEADER, 24 bpp uncompressed):
  *    'BM' magic, little-endian geometry at fixed offsets, 4-byte
  *    row padding, bottom-up pixel rows.
  *  - PNG (RFC 2083): signature + CRC-validated chunk walk
  *    (IHDR/IDAT/IEND), zlib inflate via the JDK's Inflater, per-row
  *    reversal of all five scanline filters; 8-bit RGB/RGBA,
  *    non-interlaced.
  *  - WAV (RIFF/WAVE, PCM): chunk walk over 'fmt ' (format 1,
  *    channels, sample rate, 16-bit) and 'data' (LE PCM16 frames).
  *  - Y4M (YUV4MPEG2, C420): ASCII stream header `YUV4MPEG2 W… H… F…`,
  *    then per frame a `FRAME\n` marker + planar YUV 4:2:0 payload —
  *    the uncompressed video interchange format, trivially seekable.
  *
  * Decoders VALIDATE (magic, chunk bounds, geometry) and throw
  * `MediaFormatException` on malformed input — a real parse, not a
  * fingerprint of the bytes. Encoders exist so fixtures and tests can
  * synthesize genuine files; decode(encode(x)) == x is property-tested.
  */
object MediaCodec {

  final class MediaFormatException(msg: String) extends RuntimeException(msg)

  private def fail(msg: String): Nothing = throw new MediaFormatException(msg)

  // ---------------------------------------------------------------- BMP

  final case class Bmp(width: Int, height: Int, pixels: Array[Byte]) {
    require(pixels.length == width * height * 3, "pixels must be w*h BGR triples")
  }

  /** 24 bpp BITMAPINFOHEADER encoder: bottom-up rows, 4-byte padding. */
  def encodeBmp(img: Bmp): Array[Byte] = {
    val rowBytes = img.width * 3
    val stride = (rowBytes + 3) / 4 * 4
    val dataSize = stride * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54)       // file size, reserved, data offset
    buf.putInt(40).putInt(img.width).putInt(img.height)  // DIB size, w, h (bottom-up)
    buf.putShort(1).putShort(24)                         // planes, bpp
    buf.putInt(0).putInt(dataSize)                       // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)    // 72 dpi, palette
    var y = img.height - 1
    while (y >= 0) {
      buf.put(img.pixels, y * rowBytes, rowBytes)
      var p = rowBytes; while (p < stride) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24 bpp uncompressed BMP back to top-down BGR triples. */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    if (bytes.length < 54) fail(s"BMP truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.get(0) != 'B' || buf.get(1) != 'M') fail("BMP magic missing")
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val height = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (bpp != 24) fail(s"unsupported BMP bpp $bpp (24 bpp only)")
    if (compression != 0) fail(s"unsupported BMP compression $compression")
    if (width <= 0 || height <= 0) fail(s"bad BMP geometry ${width}x$height")
    val rowBytes = width * 3
    val stride = (rowBytes + 3) / 4 * 4
    if (dataOffset.toLong + stride.toLong * height > bytes.length)
      fail(s"BMP pixel data out of bounds (${bytes.length} bytes, " +
        s"need ${dataOffset + stride * height})")
    val pixels = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      // rows are stored bottom-up
      System.arraycopy(bytes, dataOffset + (height - 1 - y) * stride,
        pixels, y * rowBytes, rowBytes)
      y += 1
    }
    Bmp(width, height, pixels)
  }

  // ---------------------------------------------------------------- WAV

  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  /** PCM16 RIFF/WAVE encoder: 'fmt ' + 'data' chunks. */
  def encodeWav(wav: Wav): Array[Byte] = {
    val dataSize = wav.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16).putShort(1)                           // PCM
    buf.putShort(wav.channels.toShort).putInt(wav.sampleRate)
    buf.putInt(wav.sampleRate * wav.channels * 2)        // byte rate
    buf.putShort((wav.channels * 2).toShort).putShort(16)// block align, bits
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataSize)
    wav.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Walk the RIFF chunks; parse 'fmt ' + 'data' into PCM16 samples. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    if (bytes.length < 44) fail(s"WAV truncated: ${bytes.length} bytes")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") fail("RIFF/WAVE magic missing")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val id = tag(off); val size = buf.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length)
        fail(s"WAV chunk '$id' out of bounds (size=$size at $off)")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"WAV fmt chunk too small: $size")
          val fmt = buf.getShort(off + 8)
          if (fmt != 1) fail(s"unsupported WAV format $fmt (PCM only)")
          channels = buf.getShort(off + 10)
          rate = buf.getInt(off + 12)
          bits = buf.getShort(off + 22)
          if (bits != 16) fail(s"unsupported WAV bit depth $bits")
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort(off + 8 + i * 2); i += 1 }
        case _ => // skip unknown chunk (LIST, fact, …) — the RIFF rule
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (rate < 0) fail("WAV fmt chunk missing")
    if (samples == null) fail("WAV data chunk missing")
    Wav(rate, channels, samples)
  }

  // ---------------------------------------------------------------- Y4M

  /** One uncompressed 4:2:0 frame: w*h luma + 2 quarter chroma planes. */
  final case class Y4mFrame(y: Array[Byte], cb: Array[Byte], cr: Array[Byte])
  final case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Vector[Y4mFrame])

  def encodeY4m(v: Y4m): Array[Byte] = {
    val header = s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C420jpeg\n"
      .getBytes(StandardCharsets.US_ASCII)
    val frameMark = "FRAME\n".getBytes(StandardCharsets.US_ASCII)
    val lumaSize = v.width * v.height
    val chromaSize = (v.width / 2) * (v.height / 2)
    val out = ByteBuffer.allocate(header.length +
      v.frames.size * (frameMark.length + lumaSize + 2 * chromaSize))
    out.put(header)
    v.frames.foreach { f =>
      require(f.y.length == lumaSize && f.cb.length == chromaSize &&
        f.cr.length == chromaSize, "plane sizes must match geometry")
      out.put(frameMark).put(f.y).put(f.cb).put(f.cr)
    }
    out.array()
  }

  def decodeY4m(bytes: Array[Byte]): Y4m = {
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) fail("Y4M header line missing")
    val header = new String(bytes, 0, nl, StandardCharsets.US_ASCII)
    val parts = header.split(' ')
    if (parts.head != "YUV4MPEG2") fail(s"Y4M magic missing: '${parts.head}'")
    def param(p: Char): Option[String] =
      parts.tail.find(_.headOption.contains(p)).map(_.drop(1))
    val width = param('W').map(_.toInt).getOrElse(fail("Y4M W param missing"))
    val height = param('H').map(_.toInt).getOrElse(fail("Y4M H param missing"))
    val (fpsNum, fpsDen) = param('F').map { f =>
      val Array(n, d) = f.split(':'); (n.toInt, d.toInt)
    }.getOrElse((30, 1))
    param('C').foreach { c =>
      if (!c.startsWith("420")) fail(s"unsupported Y4M chroma C$c (4:2:0 only)") }
    if (width <= 0 || height <= 0 || width % 2 != 0 || height % 2 != 0)
      fail(s"bad Y4M geometry ${width}x$height (C420 needs even dims)")
    val lumaSize = width * height
    val chromaSize = (width / 2) * (height / 2)
    val frameMark = "FRAME".getBytes(StandardCharsets.US_ASCII)
    var off = nl + 1
    val frames = Vector.newBuilder[Y4mFrame]
    while (off < bytes.length) {
      if (off + frameMark.length > bytes.length ||
          !frameMark.indices.forall(i => bytes(off + i) == frameMark(i)))
        fail(s"Y4M FRAME marker missing at $off")
      val fnl = bytes.indexOf('\n'.toByte, off)
      if (fnl < 0) fail("Y4M frame header unterminated")
      off = fnl + 1
      if (off + lumaSize + 2 * chromaSize > bytes.length)
        fail(s"Y4M frame payload truncated at $off")
      val y = java.util.Arrays.copyOfRange(bytes, off, off + lumaSize)
      val cb = java.util.Arrays.copyOfRange(bytes, off + lumaSize,
        off + lumaSize + chromaSize)
      val cr = java.util.Arrays.copyOfRange(bytes, off + lumaSize + chromaSize,
        off + lumaSize + 2 * chromaSize)
      frames += Y4mFrame(y, cb, cr)
      off += lumaSize + 2 * chromaSize
    }
    Y4m(width, height, fpsNum, fpsDen, frames.result())
  }

  // ---------------------------------------------------------------- PNG

  /** Decoded PNG: top-down interleaved RGB (channels=3) or RGBA
    * (channels=4) bytes, 8 bits per channel.
    */
  final case class Png(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]) {
    require(channels == 3 || channels == 4, "channels must be 3 (RGB) or 4 (RGBA)")
    require(pixels.length == width * height * channels,
      "pixels must be w*h*channels bytes")
  }

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    val typB = typ.getBytes(StandardCharsets.US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(typB); crc.update(data)
    out.write(len); out.write(typB); out.write(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** PNG encoder (spec: RFC 2083 layout): 8-bit color type 2 (RGB) or
    * 6 (RGBA), non-interlaced, every scanline filter 0, IDAT deflated
    * at level 0 (STORED blocks). Level 0 on purpose: zlib stored-block
    * framing is pure arithmetic (2-byte header + 4-byte adler + 5
    * bytes per ≤65535-byte block), so the total file size is exactly
    * derivable from (w, h, channels) — which is what lets
    * q_multimodal_meta's oracle re-derive PNG byte_len the way it
    * re-derives the BMP stride. A real-world compressed PNG still
    * DECODES through [[decodePng]] (the inflater doesn't care how the
    * stream was produced, and all five row filters are reversed).
    */
  def encodePng(img: Png): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte)                                         // bit depth
      .put((if (img.channels == 3) 2 else 6).toByte)         // color type
      .put(0.toByte).put(0.toByte).put(0.toByte)             // deflate, filter0, no interlace
      .array()
    pngChunk(out, "IHDR", ihdr)
    val rowBytes = img.width * img.channels
    val raw = new Array[Byte]((1 + rowBytes) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (1 + rowBytes)) = 0                            // filter type None
      System.arraycopy(img.pixels, y * rowBytes, raw, y * (1 + rowBytes) + 1, rowBytes)
      y += 1
    }
    val d = new java.util.zip.Deflater(0)
    d.setInput(raw); d.finish()
    val zbuf = new Array[Byte](raw.length + 11 + 5 * (raw.length / 65535 + 1))
    var zlen = 0
    while (!d.finished()) zlen += d.deflate(zbuf, zlen, zbuf.length - zlen)
    d.end()
    pngChunk(out, "IDAT", java.util.Arrays.copyOf(zbuf, zlen))
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse a non-interlaced 8-bit RGB/RGBA PNG: signature, chunk walk
    * with CRC validation, IDAT concatenation + inflate, and per-row
    * reversal of all five scanline filters (None/Sub/Up/Average/
    * Paeth) — so any compliant encoder's output decodes, not just
    * [[encodePng]]'s filter-0 stream. Ancillary chunks are skipped by
    * the PNG rule (lowercase first letter = non-critical).
    */
  def decodePng(bytes: Array[Byte]): Png = {
    if (bytes.length < PngSig.length + 12) fail(s"PNG truncated: ${bytes.length} bytes")
    if (!PngSig.indices.forall(i => bytes(i) == PngSig(i))) fail("PNG signature missing")
    val buf = ByteBuffer.wrap(bytes)                         // PNG ints are big-endian
    var off = PngSig.length
    var width = -1; var height = -1; var channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      if (off + 12 > bytes.length) fail(s"PNG chunk header out of bounds at $off")
      val len = buf.getInt(off)
      val typ = new String(bytes, off + 4, 4, StandardCharsets.US_ASCII)
      if (len < 0 || off + 12 + len > bytes.length)
        fail(s"PNG chunk '$typ' out of bounds (len=$len at $off)")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue.toInt != buf.getInt(off + 8 + len))
        fail(s"PNG chunk '$typ' CRC mismatch")
      typ match {
        case "IHDR" =>
          if (len != 13) fail(s"PNG IHDR length $len")
          width = buf.getInt(off + 8)
          height = buf.getInt(off + 12)
          val depth = bytes(off + 16); val color = bytes(off + 17)
          val interlace = bytes(off + 20)
          if (depth != 8) fail(s"unsupported PNG bit depth $depth (8 only)")
          channels = color match {
            case 2 => 3
            case 6 => 4
            case c => fail(s"unsupported PNG color type $c (RGB/RGBA only)")
          }
          if (interlace != 0) fail("interlaced PNG unsupported")
          if (width <= 0 || height <= 0) fail(s"bad PNG geometry ${width}x$height")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => ended = true
        case t if t.nonEmpty && t.charAt(0).isLower => // ancillary: skip
        case t => fail(s"unsupported critical PNG chunk '$t'")
      }
      off += 12 + len
    }
    if (width < 0) fail("PNG IHDR missing")
    if (idat.size() == 0) fail("PNG IDAT missing")
    val rowBytes = width * channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) fail("PNG IDAT stream truncated")
        got += n
      }
    } catch { case e: java.util.zip.DataFormatException =>
      fail(s"PNG IDAT corrupt: ${e.getMessage}")
    } finally inf.end()
    if (got != raw.length)
      fail(s"PNG pixel data short: $got of ${raw.length} bytes")
    // reverse scanline filters in place, row by row (spec §6)
    val px = new Array[Byte](rowBytes * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + rowBytes)) & 0xff
      val ro = y * (1 + rowBytes) + 1
      val po = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(ro + x) & 0xff
        val left = if (x >= bpp) px(po + x - bpp) & 0xff else 0
        val up = if (y > 0) px(po - rowBytes + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) px(po - rowBytes + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case t => fail(s"unknown PNG filter type $t in row $y")
        }
        px(po + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Png(width, height, channels, px)
  }

  // ---------------------------------------------------------------- GIF

  /** One decoded GIF frame: palette INDICES (one byte per pixel) over
    * the frame's own rectangle, plus its Graphic Control delay and an
    * optional local color table (RGB triples) that overrides the
    * global one for this frame only.
    */
  final case class GifFrame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, pixels: Array[Byte],
      localPalette: Option[Array[Byte]] = None) {
    require(pixels.length == width * height, "pixels must be w*h indices")
  }

  /** Decoded GIF: logical screen geometry, the global color table
    * (RGB triples), and the frame sequence — the animation surface the
    * multimodal frame sampler reads.
    */
  final case class Gif(width: Int, height: Int, palette: Array[Byte],
      frames: Vector[Gif.Frame])

  object Gif { type Frame = GifFrame }

  private def gifU16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  /** GIF LZW image data in the CLEAR-RESET form: 8-bit min code size,
    * a clear code before every run of ≤254 literal pixel codes, so the
    * dictionary never grows past 511 and EVERY code is exactly 9 bits
    * (LSB-first packing per the GIF89a spec, appendix F). Valid LZW —
    * any conforming decoder reads it — and its length is pure integer
    * arithmetic: codes = npix + 2 + ⌊(npix−1)/254⌋, bytes = ⌈9·codes/8⌉.
    * That determinism is what lets q_multimodal_meta's oracle re-derive
    * GIF byte_len the way it re-derives the PNG stored-block framing.
    */
  private def gifLzwClearReset(pixels: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(pixels.length * 9 / 8 + 8)
    var cur = 0; var nbits = 0
    def put(code: Int): Unit = {
      cur |= code << nbits; nbits += 9
      while (nbits >= 8) { out.write(cur & 0xff); cur >>>= 8; nbits -= 8 }
    }
    put(256)                                   // initial CLEAR
    var i = 0; var sinceClear = 0
    while (i < pixels.length) {
      if (sinceClear == 254) { put(256); sinceClear = 0 }
      put(pixels(i) & 0xff); sinceClear += 1; i += 1
    }
    put(257)                                   // EOI
    if (nbits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  /** GIF89a encoder: logical screen descriptor with a 256-entry global
    * color table, one Graphic Control Extension + image descriptor per
    * frame, clear-reset LZW data in ≤255-byte sub-blocks, trailer.
    */
  def encodeGif(g: Gif): Array[Byte] = {
    require(g.palette.length == 768, "encoder wants a full 256-entry GCT")
    require(g.width > 0 && g.width <= 0xffff && g.height > 0 && g.height <= 0xffff,
      "GIF geometry must fit u16")
    require(g.frames.nonEmpty, "GIF needs at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    gifU16(out, g.width); gifU16(out, g.height)
    out.write(0xf7)                            // GCT present, 8-bit, 256 entries
    out.write(0); out.write(0)                 // bg index, aspect
    out.write(g.palette)
    g.frames.foreach { f =>
      require(f.left + f.width <= g.width && f.top + f.height <= g.height,
        "frame rectangle must sit inside the logical screen")
      out.write(0x21); out.write(0xf9); out.write(4)   // GCE
      out.write(0)                                     // no disposal/transparency
      gifU16(out, f.delayCs)
      out.write(0); out.write(0)                       // transparent idx, terminator
      out.write(0x2c)                                  // image descriptor
      gifU16(out, f.left); gifU16(out, f.top)
      gifU16(out, f.width); gifU16(out, f.height)
      f.localPalette match {                           // LCT flag + table
        case Some(p) =>
          val entries = p.length / 3
          require(p.length % 3 == 0 && Integer.bitCount(entries) == 1 &&
            entries >= 2 && entries <= 256,
            s"local color table needs a power-of-two entry count of RGB triples, got ${p.length} bytes")
          out.write(0x80 | (Integer.numberOfTrailingZeros(entries) - 1))
          out.write(p, 0, p.length)
        case None => out.write(0)                      // no LCT, not interlaced
      }
      out.write(8)                                     // LZW min code size
      val data = gifLzwClearReset(f.pixels)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n); off += n
      }
      out.write(0)                                     // block terminator
    }
    out.write(0x3b)                                    // trailer
    out.toByteArray
  }

  /** Full adaptive GIF LZW decode (spec appendix F): LSB-first variable
    * code width (minCodeSize+1 … 12 bits), dictionary rebuild on CLEAR,
    * the KwKwK first-use case, and the deferred-clear convention (a
    * full 4096-entry table simply stops growing) — so output from ANY
    * conforming encoder decodes, not just [[gifLzwClearReset]]'s
    * fixed-width stream.
    */
  private def gifLzwDecode(minCodeSize: Int, data: Array[Byte],
      expected: Int): Array[Byte] = {
    if (minCodeSize < 2 || minCodeSize > 8) fail(s"bad LZW min code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    val out = new Array[Byte](expected)
    var outN = 0
    var dictSize = eoi + 1
    var codeWidth = minCodeSize + 1
    var prev = -1
    var prevFirst: Byte = 0
    var cur = 0; var nbits = 0; var pos = 0
    var done = false
    while (!done) {
      while (nbits < codeWidth && pos < data.length) {
        cur |= (data(pos) & 0xff) << nbits; nbits += 8; pos += 1
      }
      if (nbits < codeWidth) fail("GIF LZW stream truncated before EOI")
      val code = cur & ((1 << codeWidth) - 1)
      cur >>>= codeWidth; nbits -= codeWidth
      if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (code > dictSize || (code == dictSize && prev < 0))
          fail(s"GIF LZW code $code out of range (dict $dictSize)")
        var sp = 0
        var cc = code
        if (cc == dictSize) {                  // KwKwK: string(prev) + first(prev)
          stack(sp) = prevFirst; sp += 1; cc = prev
        }
        while (cc >= clear + 2) { stack(sp) = suffix(cc); sp += 1; cc = prefix(cc) }
        if (cc >= clear) fail(s"GIF LZW chain hit reserved code $cc")
        val first = cc.toByte
        stack(sp) = first; sp += 1
        if (outN + sp > expected)
          fail(s"GIF LZW output overruns ${expected}-pixel frame")
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (prev >= 0 && dictSize < 4096) {
          prefix(dictSize) = prev; suffix(dictSize) = first; dictSize += 1
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code; prevFirst = first
      }
    }
    if (outN != expected) fail(s"GIF frame short: $outN of $expected pixels")
    out
  }

  /** Parse a GIF87a/GIF89a file: header + logical screen descriptor,
    * global color table, extension blocks (Graphic Control delays are
    * kept, other extensions skipped by sub-block walk), per-frame image
    * descriptors with optional local color tables, and full adaptive
    * LZW decode of each frame. Interlaced frames are rejected (like
    * interlaced PNG).
    */
  def decodeGif(bytes: Array[Byte]): Gif = {
    if (bytes.length < 14) fail(s"GIF truncated: ${bytes.length} bytes")
    val magic = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
    if (magic != "GIF89a" && magic != "GIF87a") fail(s"GIF signature missing ('$magic')")
    def u8(off: Int): Int = {
      if (off >= bytes.length) fail(s"GIF out of bounds at $off")
      bytes(off) & 0xff
    }
    // through the bounds-checked u8: a GIF truncated mid-descriptor
    // must fail with the codec's typed error, never a raw AIOOBE
    def u16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    val width = u16(6); val height = u16(8)
    if (width <= 0 || height <= 0) fail(s"bad GIF geometry ${width}x$height")
    val packed = u8(10)
    var off = 13
    val palette =
      if ((packed & 0x80) != 0) {
        val n = 3 * (2 << (packed & 7))
        if (off + n > bytes.length) fail("GIF global color table out of bounds")
        val p = java.util.Arrays.copyOfRange(bytes, off, off + n); off += n; p
      } else Array.emptyByteArray
    def skipSubBlocks(start: Int): Int = {
      var o = start
      while (u8(o) != 0) {
        val n = u8(o)
        if (o + 1 + n > bytes.length) fail(s"GIF sub-block out of bounds at $o")
        o += 1 + n
      }
      o + 1
    }
    val frames = Vector.newBuilder[GifFrame]
    var pendingDelay = 0
    var ended = false
    while (!ended) {
      u8(off) match {
        case 0x3b => ended = true
        case 0x21 =>                                   // extension
          val label = u8(off + 1)
          if (label == 0xf9) {                         // Graphic Control
            if (u8(off + 2) != 4) fail("GIF GCE block size must be 4")
            pendingDelay = u16(off + 4)
            off = skipSubBlocks(off + 7)
          } else off = skipSubBlocks(off + 2)
        case 0x2c =>                                   // image descriptor
          val left = u16(off + 1); val top = u16(off + 3)
          val fw = u16(off + 5); val fh = u16(off + 7)
          val fpacked = u8(off + 9)
          if ((fpacked & 0x40) != 0) fail("interlaced GIF unsupported")
          if (fw <= 0 || fh <= 0 || left + fw > width || top + fh > height)
            fail(s"GIF frame rectangle ${fw}x$fh+$left+$top outside ${width}x$height")
          off += 10
          val lct =
            if ((fpacked & 0x80) != 0) {
              val n = 3 * (2 << (fpacked & 7))
              if (off + n > bytes.length) fail("GIF local color table out of bounds")
              val p = java.util.Arrays.copyOfRange(bytes, off, off + n); off += n
              Some(p)
            } else None
          val minCodeSize = u8(off); off += 1
          val data = new java.io.ByteArrayOutputStream()
          while (u8(off) != 0) {
            val n = u8(off)
            if (off + 1 + n > bytes.length) fail(s"GIF image data out of bounds at $off")
            data.write(bytes, off + 1, n); off += 1 + n
          }
          off += 1
          frames += GifFrame(left, top, fw, fh, pendingDelay,
            gifLzwDecode(minCodeSize, data.toByteArray, fw * fh), lct)
          pendingDelay = 0
        case b => fail(f"unknown GIF block 0x$b%02x at $off")
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) fail("GIF has no image frames")
    Gif(width, height, palette, fs)
  }

  // ------------------------------------------------------- image resize

  /** Nearest-neighbor resample of a decoded BMP — a REAL resampler over
    * real pixels (the classic integer grid map), not a byte stride.
    */
  def resizeBmp(img: Bmp, targetW: Int, targetH: Int): Bmp = {
    require(targetW > 0 && targetH > 0, "target geometry must be positive")
    val out = new Array[Byte](targetW * targetH * 3)
    var ty = 0
    while (ty < targetH) {
      val sy = ty * img.height / targetH
      var tx = 0
      while (tx < targetW) {
        val sx = tx * img.width / targetW
        System.arraycopy(img.pixels, (sy * img.width + sx) * 3,
          out, (ty * targetW + tx) * 3, 3)
        tx += 1
      }
      ty += 1
    }
    Bmp(targetW, targetH, out)
  }
}
