package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.MediaCodec
import graft.pipeline.MediaCodec._

/** The codec is a REAL byte-format parser: these specs decode
  * hand-built files (bytes laid out from the published format specs,
  * not via the encoder) to known values, exercise validation on
  * malformed input, and property-test decode∘encode identity.
  */
class MediaCodecSpec extends AnyFunSuite {

  // ---- hand-built BMP: 2x2, 24 bpp, known pixels -------------------
  // Layout per the Windows bitmap spec: 14-byte file header + 40-byte
  // BITMAPINFOHEADER + bottom-up padded rows. 2 px * 3 B = 6 B rows
  // padded to 8. Bottom row first: (B,G,R) = (1,2,3), (4,5,6);
  // top row: (7,8,9), (10,11,12).
  private val handBmp: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    (Array[Byte]('B', 'M') ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++
      Array[Byte](1, 2, 3, 4, 5, 6, 0, 0) ++       // bottom row + pad
      Array[Byte](7, 8, 9, 10, 11, 12, 0, 0))      // top row + pad
  }

  test("hand-built 2x2 BMP decodes to exact top-down pixels") {
    val img = decodeBmp(handBmp)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq[Byte](7, 8, 9, 10, 11, 12, 1, 2, 3, 4, 5, 6))
  }

  test("BMP validation rejects malformed input") {
    val noMagic = handBmp.clone(); noMagic(0) = 'X'
    assertThrows[MediaFormatException](decodeBmp(noMagic))
    assertThrows[MediaFormatException](decodeBmp(handBmp.take(53)))
    val bpp8 = handBmp.clone(); bpp8(28) = 8
    assertThrows[MediaFormatException](decodeBmp(bpp8))
    val truncPixels = handBmp.take(60) // header promises 16 B of pixels
    assertThrows[MediaFormatException](decodeBmp(truncPixels))
  }

  // ---- hand-built WAV: mono 8 kHz, 3 known samples ------------------
  private val handWav: Array[Byte] = {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    ("RIFF".getBytes ++ le32(36 + 6) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(6) ++
      le16(100) ++ le16(-200 & 0xffff) ++ le16(32767))
  }

  test("hand-built WAV decodes to exact PCM16 samples") {
    val wav = decodeWav(handWav)
    assert(wav.sampleRate == 8000 && wav.channels == 1)
    assert(wav.samples.toSeq == Seq[Short](100, -200, 32767))
  }

  test("WAV chunk walk skips unknown chunks and validates bounds") {
    // insert a LIST chunk between fmt and data — the RIFF rule
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val withList = handWav.take(36) ++
      "LIST".getBytes ++ le32(4) ++ "INFO".getBytes ++ handWav.drop(36)
    val wav = decodeWav(withList)
    assert(wav.samples.toSeq == Seq[Short](100, -200, 32767))
    val badMagic = handWav.clone(); badMagic(8) = 'X'
    assertThrows[MediaFormatException](decodeWav(badMagic))
    val badSize = handWav.clone(); badSize(40) = 99 // data chunk overruns
    assertThrows[MediaFormatException](decodeWav(badSize))
    val floatFmt = handWav.clone(); floatFmt(20) = 3 // IEEE float
    assertThrows[MediaFormatException](decodeWav(floatFmt))
  }

  // ---- hand-built Y4M: 2x2 C420, 2 frames ---------------------------
  private val handY4m: Array[Byte] =
    "YUV4MPEG2 W2 H2 F25:1 Ip A1:1 C420jpeg\n".getBytes ++
      "FRAME\n".getBytes ++ Array[Byte](10, 20, 30, 40, 50, 60) ++
      "FRAME\n".getBytes ++ Array[Byte](11, 21, 31, 41, 51, 61)

  test("hand-built Y4M decodes to exact frames and geometry") {
    val v = decodeY4m(handY4m)
    assert(v.width == 2 && v.height == 2 && v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.size == 2)
    assert(v.frames(0).y.toSeq == Seq[Byte](10, 20, 30, 40))
    assert(v.frames(0).cb.toSeq == Seq[Byte](50) && v.frames(0).cr.toSeq == Seq[Byte](60))
    assert(v.frames(1).y.toSeq == Seq[Byte](11, 21, 31, 41))
  }

  test("Y4M validation rejects malformed streams") {
    assertThrows[MediaFormatException](decodeY4m("JUNK W2 H2\n".getBytes))
    assertThrows[MediaFormatException](decodeY4m("YUV4MPEG2 H2\n".getBytes)) // no W
    assertThrows[MediaFormatException](decodeY4m(handY4m.dropRight(2)))      // short frame
    val oddGeom = "YUV4MPEG2 W3 H2 F25:1\n".getBytes ++ "FRAME\n".getBytes ++
      Array.fill[Byte](9)(0)
    assertThrows[MediaFormatException](decodeY4m(oddGeom))
  }

  // ---- hand-built PNG: 2x5 RGB, one row per filter type -------------
  // Built from the published spec (RFC 2083), NOT via encodePng: chunk
  // CRCs computed locally, scanlines deflated at the DEFAULT level (a
  // genuinely compressed stream — proves the inflate path, not just
  // stored blocks), and the five filtered rows exercise every filter
  // reversal (None/Sub/Up/Average/Paeth). Expected pixels hand-derived
  // from the filter equations.
  private def pngChunkBytes(typ: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes); crc.update(data)
    be32(data.length) ++ typ.getBytes ++ data ++ be32(crc.getValue.toInt)
  }

  private val handPng: Array[Byte] = {
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = be32(2) ++ be32(5) ++ Array[Byte](8, 2, 0, 0, 0) // 2x5 RGB
    val filtered = Array[Byte](
      0, 1, 2, 3, 4, 5, 6,       // None
      1, 10, 10, 10, 5, 5, 5,    // Sub
      2, 1, 1, 1, 1, 1, 1,       // Up
      3, 2, 2, 2, 4, 4, 4,       // Average
      4, 3, 3, 3, 6, 6, 6)       // Paeth
    val d = new java.util.zip.Deflater() // default level: real compression
    d.setInput(filtered); d.finish()
    val zb = new Array[Byte](256)
    var zn = 0
    while (!d.finished()) zn += d.deflate(zb, zn, zb.length - zn)
    sig ++ pngChunkBytes("IHDR", ihdr) ++
      pngChunkBytes("IDAT", zb.take(zn)) ++
      pngChunkBytes("IEND", Array.emptyByteArray)
  }

  test("hand-built PNG decodes through all five filter reversals to exact pixels") {
    val img = decodePng(handPng)
    assert(img.width == 2 && img.height == 5 && img.channels == 3)
    assert(img.pixels.toSeq == Seq[Byte](
      1, 2, 3, 4, 5, 6,          // None
      10, 10, 10, 15, 15, 15,    // Sub: second pixel adds the left one
      11, 11, 11, 16, 16, 16,    // Up: adds the row above
      7, 7, 7, 15, 15, 15,       // Average: floor((left+up)/2) + raw
      10, 10, 10, 21, 21, 21))   // Paeth: predictor picks `up` both times
  }

  test("PNG validation rejects malformed input") {
    val noSig = handPng.clone(); noSig(0) = 'X'
    assertThrows[MediaFormatException](decodePng(noSig))
    val badCrc = handPng.clone(); badCrc(badCrc.length - 1) = 99 // IEND CRC
    assertThrows[MediaFormatException](decodePng(badCrc))
    val interlaced = {
      // rebuild IHDR with interlace=1 (CRC recomputed so only the
      // interlace check can fire)
      def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      val ihdr = be32(2) ++ be32(5) ++ Array[Byte](8, 2, 0, 0, 1)
      handPng.take(8) ++ pngChunkBytes("IHDR", ihdr) ++ handPng.drop(8 + 25)
    }
    assertThrows[MediaFormatException](decodePng(interlaced))
    val palette = {
      def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
      val ihdr = be32(2) ++ be32(5) ++ Array[Byte](8, 3, 0, 0, 0)
      handPng.take(8) ++ pngChunkBytes("IHDR", ihdr) ++ handPng.drop(8 + 25)
    }
    assertThrows[MediaFormatException](decodePng(palette))
    assertThrows[MediaFormatException](decodePng(handPng.take(40)))
  }

  test("PNG ancillary chunks are skipped; encoder byte length is the documented arithmetic") {
    // splice a tEXt chunk between IHDR and IDAT — decode must ignore it
    val withText = handPng.take(8 + 25) ++
      pngChunkBytes("tEXt", "k v".getBytes) ++ handPng.drop(8 + 25)
    assert(decodePng(withText).pixels.toSeq == decodePng(handPng).pixels.toSeq)
    // the size formula q_multimodal_meta's oracle re-derives:
    // 57 + raw + 6 + 5*ceil(raw/65535) for raw = h*(1+w*ch)
    Seq((2, 5, 3), (31, 19, 4), (200, 180, 3)).foreach { case (w, h, ch) =>
      val raw = h * (1 + w * ch)
      val img = Png(w, h, ch, Array.tabulate(w * h * ch)(i => (i % 251).toByte))
      assert(encodePng(img).length == 57 + raw + 6 + 5 * ((raw + 65534) / 65535),
        s"PNG size formula broke at ${w}x${h}x$ch")
    }
  }

  // ---- hand-built GIF: REAL adaptive-LZW stream ---------------------
  // 5x1 image, minCodeSize=2 (4-color GCT), pixels [1,1,1,1,1]. A real
  // compressor emits CLEAR(4), 1, 6, 6, EOI(5): code 6 is the KwKwK
  // first-use case ("11" referenced the step it is defined), and the
  // dictionary reaching 8 entries grows the code width 3→4 bits
  // mid-stream, so this single stream exercises adaptive width,
  // dictionary reuse, AND KwKwK — none of which the clear-reset
  // encoder produces. Bits LSB-first: [4,1,6,6] at 3 bits + [5] at 4
  // bits pack to 0x8C 0x5D.
  private val handGif: Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    ("GIF89a".getBytes ++ le16(5) ++ le16(1) ++
      Array[Byte](0x81.toByte, 0, 0) ++                 // GCT: 4 entries
      Array[Byte](0, 0, 0, 127, 0, 0, 0, 127, 0, 0, 0, 127) ++
      Array[Byte](0x2c) ++ le16(0) ++ le16(0) ++ le16(5) ++ le16(1) ++
      Array[Byte](0) ++                                 // no LCT, no interlace
      Array[Byte](2) ++                                 // LZW min code size
      Array[Byte](2, 0x8c.toByte, 0x5d) ++              // one 2-byte sub-block
      Array[Byte](0, 0x3b))                             // terminator + trailer
  }

  test("hand-built compressed GIF decodes through adaptive LZW (KwKwK + width growth)") {
    val g = decodeGif(handGif)
    assert(g.width == 5 && g.height == 1 && g.frames.size == 1)
    assert(g.palette.length == 12)
    assert(g.frames(0).pixels.toSeq == Seq[Byte](1, 1, 1, 1, 1))
  }

  test("GIF validation rejects malformed input") {
    val noMagic = handGif.clone(); noMagic(0) = 'X'
    assertThrows[MediaFormatException](decodeGif(noMagic))
    assertThrows[MediaFormatException](decodeGif(handGif.take(20)))
    val interlaced = handGif.clone()
    // image-descriptor packed byte: 6 header + 7 LSD + 12 GCT + 9 into
    // the descriptor
    interlaced(6 + 7 + 12 + 9) = 0x40
    assertThrows[MediaFormatException](decodeGif(interlaced))
    val badCode = handGif.clone()
    badCode(6 + 7 + 12 + 10 + 1 + 1) = 0x7f              // first LZW data byte
    assertThrows[MediaFormatException](decodeGif(badCode))
    // zero data sub-blocks: the LZW stream ends before any EOI code
    val noEoi = handGif.take(6 + 7 + 12 + 10 + 1) ++ Array[Byte](0, 0x3b)
    assertThrows[MediaFormatException](decodeGif(handGif.take(handGif.length - 4)))
    assertThrows[MediaFormatException](decodeGif(noEoi))
    // truncation mid image-descriptor / mid-GCE: the u16 reads must
    // surface the codec's typed error, not a raw index exception
    (15 to 6 + 7 + 12 + 9).foreach { n =>
      assertThrows[MediaFormatException](decodeGif(handGif.take(n)))
    }
  }

  test("GIF encoder byte length is the documented clear-reset arithmetic") {
    val pal = Array.tabulate(768)(i => (i / 3).toByte)
    // spans the 254-literal clear boundary and multi-subblock framing
    Seq((3, 2, 1), (16, 16, 2), (64, 40, 3)).foreach { case (w, h, nf) =>
      val frames = Vector.tabulate(nf)(f =>
        GifFrame(0, 0, w, h, 10, Array.tabulate(w * h)(i => ((i + f) % 256).toByte)))
      val npix = w * h
      val codes = npix + 2 + (npix - 1) / 254
      val db = (9 * codes + 7) / 8
      val expected = 782 + nf * (20 + db + (db + 254) / 255)
      assert(encodeGif(Gif(w, h, pal, frames)).length == expected,
        s"GIF size formula broke at ${w}x$h x$nf")
    }
  }

  test("decode(encode(x)) is the identity on animated GIF (delays, geometry, indices)") {
    val rnd = new scala.util.Random(11)
    val pal = Array.tabulate(768)(_.toByte)
    (1 to 20).foreach { _ =>
      val w = rnd.nextInt(40) + 1; val h = rnd.nextInt(30) + 1
      val frames = Vector.fill(rnd.nextInt(6) + 1)(
        GifFrame(0, 0, w, h, rnd.nextInt(100),
          Array.fill(w * h)(rnd.nextInt.toByte),
          // every other frame carries a local color table (random
          // power-of-two entry count) — the encoder must emit it, not
          // silently drop it
          if (rnd.nextBoolean())
            Some(Array.fill(3 * (2 << rnd.nextInt(8)))(rnd.nextInt.toByte))
          else None))
      val back = decodeGif(encodeGif(Gif(w, h, pal, frames)))
      assert(back.width == w && back.height == h &&
        back.palette.toSeq == pal.toSeq &&
        back.frames.size == frames.size &&
        back.frames.zip(frames).forall { case (a, b) =>
          a.delayCs == b.delayCs && a.width == w && a.height == h &&
            a.pixels.toSeq == b.pixels.toSeq &&
            a.localPalette.map(_.toSeq) == b.localPalette.map(_.toSeq) })
    }
    // a non-power-of-two local table is an explicit error, not a drop
    assertThrows[IllegalArgumentException](encodeGif(Gif(1, 1, pal, Vector(
      GifFrame(0, 0, 1, 1, 0, Array[Byte](0), Some(new Array[Byte](9)))))))
  }

  // ---- round trips and the resampler --------------------------------

  test("decode(encode(x)) is the identity on all four formats") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val w = rnd.nextInt(30) + 1; val h = rnd.nextInt(20) + 1
      val img = Bmp(w, h, Array.fill((w * h * 3))(rnd.nextInt.toByte))
      val back = decodeBmp(encodeBmp(img))
      assert(back.width == w && back.height == h &&
        back.pixels.toSeq == img.pixels.toSeq)

      val ch = rnd.nextInt(2) + 3 // RGB or RGBA
      val png = Png(w, h, ch, Array.fill(w * h * ch)(rnd.nextInt.toByte))
      val pBack = decodePng(encodePng(png))
      assert(pBack.width == w && pBack.height == h && pBack.channels == ch &&
        pBack.pixels.toSeq == png.pixels.toSeq)

      val n = rnd.nextInt(500)
      val wav = Wav(rnd.nextInt(48000) + 1, rnd.nextInt(2) + 1,
        Array.fill(n)(rnd.nextInt.toShort))
      val wBack = decodeWav(encodeWav(wav))
      assert(wBack.sampleRate == wav.sampleRate && wBack.channels == wav.channels &&
        wBack.samples.toSeq == wav.samples.toSeq)

      val vw = (rnd.nextInt(8) + 1) * 2; val vh = (rnd.nextInt(6) + 1) * 2
      val frames = Vector.fill(rnd.nextInt(5) + 1)(Y4mFrame(
        Array.fill(vw * vh)(rnd.nextInt.toByte),
        Array.fill(vw / 2 * (vh / 2))(rnd.nextInt.toByte),
        Array.fill(vw / 2 * (vh / 2))(rnd.nextInt.toByte)))
      val vid = Y4m(vw, vh, 30, 1, frames)
      val vBack = decodeY4m(encodeY4m(vid))
      assert(vBack.width == vw && vBack.height == vh &&
        vBack.frames.size == frames.size &&
        vBack.frames.zip(frames).forall { case (a, b) =>
          a.y.toSeq == b.y.toSeq && a.cb.toSeq == b.cb.toSeq && a.cr.toSeq == b.cr.toSeq })
    }
  }

  test("nearest-neighbor resize maps the integer pixel grid exactly") {
    // 2x2 distinct pixels upsampled 2x: each source pixel becomes a
    // 2x2 block (floor mapping sx = tx*srcW/dstW)
    val img = Bmp(2, 2, Array[Byte](1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4))
    val up = MediaCodec.resizeBmp(img, 4, 4)
    def px(b: Bmp, x: Int, y: Int): Byte = b.pixels((y * b.width + x) * 3)
    assert(px(up, 0, 0) == 1 && px(up, 1, 0) == 1 && px(up, 2, 0) == 2 && px(up, 3, 0) == 2)
    assert(px(up, 0, 3) == 3 && px(up, 3, 3) == 4)
    // downsample back recovers the corners
    val down = MediaCodec.resizeBmp(up, 2, 2)
    assert(down.pixels.toSeq == img.pixels.toSeq)
  }
}
