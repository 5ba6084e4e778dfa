package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-data-pipeline mandate): media
  * payloads are opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms (`mapPartitions` — the Scala
  * analog of a batched Pandas UDF: one iterator per partition,
  * per-partition setup amortized).
  *
  * The payloads are REAL files in public byte formats, parsed by a
  * REAL codec ([[MediaCodec]]): images are 24 bpp BMP, 8-bit RGB/RGBA
  * PNG (chunk walk + CRC + Inflater), and animated GIF89a (full
  * adaptive LZW), audio is PCM16 RIFF/WAV, video is YUV4MPEG2 (C420).
  * The fixture generator
  * synthesizes genuine files from the documents table (deterministic
  * content), and the decode path validates magic/chunk bounds/geometry
  * exactly as it would against bytes from an object store — pointing
  * these queries at any compliant BMP/WAV/Y4M file works.
  */
object Multimodal extends QueryModule {

  /** The asset row contract: id + opaque payload + typed metadata.
    * Metadata mirrors what the payload header itself declares — the
    * round trip is spec'd (MediaCodecSpec). */
  final case class Asset(
      asset_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      byte_len: Long,
      width: Int,      // from the BMP/Y4M header (0 for audio)
      height: Int,
      n_frames: Int,   // Y4M frame count / WAV sample count (1 for image)
      sample_rate: Int,// WAV fmt chunk (0 for image/video)
      mean_val: Double,// mean decoded CONTENT (pixels / samples / luma)
      content_hash: Long)

  /** Deterministic content generator: cycle the document's UTF-8 bytes
    * to fill a plane/sample buffer. Stands in for real media CONTENT
    * (the container format around it is real). */
  private def fill(src: Array[Byte], n: Int, salt: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = (src(i % src.length) + salt).toByte; i += 1 }
    out
  }

  private[graft] def makePayload(kind: String, text: String,
      nChars: Long): Array[Byte] = {
    val src0 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // fail loudly, don't silently diverge: the closed-form oracles of
    // q_multimodal_audio/pixels/frames re-derive this generator in SQL
    // as `src(i % L)` with L = length(text) and per-CHAR ascii() reads
    // — an empty or non-ASCII document would make Spark and the oracle
    // disagree silently instead of failing here (PipelineSpec pins the
    // fixture preconditions)
    require(src0.nonEmpty,
      "multimodal payload generator: document text must be non-empty")
    require(src0.length == text.length,
      "multimodal payload generator: document text must be pure ASCII")
    val src = src0
    kind match {
      case "image" =>
        val w = (nChars % 31 + 2).toInt; val h = (nChars % 23 + 2).toInt
        MediaCodec.encodeBmp(MediaCodec.Bmp(w, h, fill(src, w * h * 3, 0)))
      case "png" =>
        val w = (nChars % 29 + 2).toInt; val h = (nChars % 19 + 2).toInt
        val ch = (3 + nChars % 2).toInt // alternate RGB / RGBA
        MediaCodec.encodePng(MediaCodec.Png(w, h, ch, fill(src, w * h * ch, 0)))
      case "audio" =>
        val n = (nChars % 997 + 64).toInt
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) {
          samples(i) = (((src(i % src.length) & 0xff) - 128) * 256).toShort
          i += 1
        }
        MediaCodec.encodeWav(MediaCodec.Wav(16000, 1, samples))
      case "gif" =>
        val w = (nChars % 21 + 2).toInt; val h = (nChars % 13 + 2).toInt
        val nf = (nChars % 8 + 1).toInt
        val pal = new Array[Byte](768)                 // grayscale ramp GCT
        var i = 0
        while (i < 256) {
          pal(3 * i) = i.toByte; pal(3 * i + 1) = i.toByte; pal(3 * i + 2) = i.toByte
          i += 1
        }
        val frames = Vector.tabulate(nf) { f =>
          MediaCodec.GifFrame(0, 0, w, h, 10, fill(src, w * h, f))
        }
        MediaCodec.encodeGif(MediaCodec.Gif(w, h, pal, frames))
      case _ =>
        val w = (nChars % 15 + 1).toInt * 2; val h = (nChars % 11 + 1).toInt * 2
        val nf = (nChars % 16 + 1).toInt
        val frames = Vector.tabulate(nf) { f =>
          MediaCodec.Y4mFrame(fill(src, w * h, f),
            fill(src, w / 2 * (h / 2), f + 64), fill(src, w / 2 * (h / 2), f + 128))
        }
        MediaCodec.encodeY4m(MediaCodec.Y4m(w, h, 30, 1, frames))
    }
  }

  /** Fixture-derived assets: REAL BMP/WAV/Y4M files synthesized from
    * the documents table (deterministic bytes), carrying the typed
    * metadata the headers themselves declare. Real pipelines read the
    * same schema from parquet/object-store binary columns. The
    * generator is a narrow partition-local map — no shuffle.
    */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { it =>
        it.map { case (id, text, nChars) =>
          val kind = (id % 5) match {
            case 0 => "image"; case 1 => "audio"; case 2 => "video"
            case 3 => "png"; case _ => "gif" }
          val payload = makePayload(kind, text, nChars)
          val (w, h, nf) = kind match {
            case "image" =>
              ((nChars % 31 + 2).toInt, (nChars % 23 + 2).toInt, 1)
            case "png" =>
              ((nChars % 29 + 2).toInt, (nChars % 19 + 2).toInt, 1)
            case "gif" =>
              ((nChars % 21 + 2).toInt, (nChars % 13 + 2).toInt,
                (nChars % 8 + 1).toInt)
            case "audio" => (0, 0, 0)
            case _ => ((nChars % 15 + 1).toInt * 2, (nChars % 11 + 1).toInt * 2,
              (nChars % 16 + 1).toInt)
          }
          Asset(id, kind, payload, w, h, nf)
        }
      }
  }

  /** Partition-local batch decode through the REAL codec: parse the
    * container, extract header geometry + content statistics. One
    * codec dispatch per row, streaming over the iterator; no shuffle —
    * scales with input splits.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        def hash(bs: Array[Byte]): Long = {
          var h = 1125899906842597L
          bs.foreach(b => h = 31 * h + (b & 0xff)); h
        }
        a.kind match {
          case "image" =>
            val img = MediaCodec.decodeBmp(a.payload)
            val mean = img.pixels.map(_ & 0xff).sum.toDouble / img.pixels.length
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              img.width, img.height, 1, 0, mean, hash(img.pixels))
          case "png" =>
            val img = MediaCodec.decodePng(a.payload)
            val mean = img.pixels.map(_ & 0xff).sum.toDouble / img.pixels.length
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              img.width, img.height, 1, 0, mean, hash(img.pixels))
          case "gif" =>
            val g = MediaCodec.decodeGif(a.payload)
            val idx = g.frames.iterator.flatMap(_.pixels.iterator).toArray
            val mean =
              if (idx.isEmpty) 0.0
              else idx.map(_ & 0xff).sum.toDouble / idx.length
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              g.width, g.height, g.frames.size, 0, mean, hash(idx))
          case "audio" =>
            val wav = MediaCodec.decodeWav(a.payload)
            val mean =
              if (wav.samples.isEmpty) 0.0
              else wav.samples.map(s => math.abs(s.toInt).toLong).sum.toDouble /
                wav.samples.length
            val bytes = new Array[Byte](wav.samples.length * 2)
            var i = 0
            while (i < wav.samples.length) {
              bytes(2 * i) = (wav.samples(i) & 0xff).toByte
              bytes(2 * i + 1) = ((wav.samples(i) >> 8) & 0xff).toByte
              i += 1
            }
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              0, 0, wav.samples.length, wav.sampleRate, mean, hash(bytes))
          case _ =>
            val vid = MediaCodec.decodeY4m(a.payload)
            val luma = vid.frames.headOption.map(_.y).getOrElse(Array.empty[Byte])
            val mean =
              if (luma.isEmpty) 0.0
              else luma.map(_ & 0xff).sum.toDouble / luma.length
            AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
              vid.width, vid.height, vid.frames.size, 0, mean,
              hash(vid.frames.flatMap(_.y).toArray))
        }
      }
    }
  }

  final case class ResizedAsset(
      asset_id: Long,
      kind: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Image resize through the real codec: decode BMP → nearest-neighbor
    * resample over actual pixels → re-encode BMP. Narrow map, no
    * shuffle; per-partition setup amortized like a batched Pandas UDF.
    */
  def resizeAssets(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        val img = MediaCodec.decodeBmp(a.payload)
        val resized = MediaCodec.resizeBmp(img, targetW, targetH)
        ResizedAsset(a.asset_id, a.kind, targetW, targetH,
          MediaCodec.encodeBmp(resized))
      }
    }
  }

  /** Frame sampling through the real codec: parse the animation stream
    * (Y4M or animated GIF), keep every k-th frame, emit one row per
    * sampled frame with its pixel plane (Y4M luma / GIF palette
    * indices). Partition-local flatMap — the generator shape with real
    * frames.
    */
  def sampleFrames(assets: Dataset[Asset], everyK: Int = 4): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(a => a.kind == "video" || a.kind == "gif").flatMap { a =>
      val frames: IndexedSeq[Array[Byte]] = a.kind match {
        case "video" => MediaCodec.decodeY4m(a.payload).frames.map(_.y)
        case _ => MediaCodec.decodeGif(a.payload).frames.map(_.pixels)
      }
      (0 until frames.size by everyK).map { i =>
        (a.asset_id, i.toLong, frames(i))
      }
    }.toDF("asset_id", "frame_idx", "frame_luma")
  }

  /** [[sampleFrames]] reduced to per-frame integer stats (byte count +
    * exact byte sum, order-free) — the representation whose values the
    * q_multimodal_frames oracle re-derives in closed form.
    */
  def sampleFrameStats(assets: Dataset[Asset], everyK: Int = 4): DataFrame = {
    import assets.sparkSession.implicits._
    assets.filter(a => a.kind == "video" || a.kind == "gif").flatMap { a =>
      val frames: IndexedSeq[Array[Byte]] = a.kind match {
        case "video" => MediaCodec.decodeY4m(a.payload).frames.map(_.y)
        case _ => MediaCodec.decodeGif(a.payload).frames.map(_.pixels)
      }
      (0 until frames.size by everyK).map { i =>
        val p = frames(i)
        var sum = 0L; var j = 0
        while (j < p.length) { sum += (p(j) & 0xff); j += 1 }
        (a.asset_id, i.toLong, p.length.toLong, sum)
      }
    }.toDF("asset_id", "frame_idx", "frame_len", "frame_sum")
  }

  def entries: Map[String, QueryDef] = Map(

    // Header geometry via the real codec — HASH-CHECKED: the Spark
    // side PARSES the container bytes (magic, chunk walk, geometry),
    // while the oracle re-derives the same geometry ARITHMETICALLY
    // from the fixture generator's parameters (BMP row stride + 54-
    // byte header, RIFF 44-byte header + 2 bytes/sample, Y4M ASCII
    // header whose length depends on the printed W/H digits plus
    // FRAME\n-delimited 4:2:0 planes, and PNG's fully-determined
    // layout: 8-byte signature + 25-byte IHDR chunk + one IDAT whose
    // level-0 zlib stream is raw + 6 + 5·⌈raw/65535⌉ bytes for
    // raw = h·(1 + w·channels) filtered scanlines + 12-byte IEND;
    // and GIF's clear-reset LZW layout: 781 header+GCT bytes plus a
    // trailer, and per frame an 8-byte GCE + 10-byte descriptor +
    // 1 min-code byte + ⌈9·codes/8⌉ data bytes for
    // codes = npix + 2 + ⌊(npix−1)/254⌋, framed in ≤255-byte
    // sub-blocks with a terminator).
    // Two independent routes to the same numbers: a decoder bug
    // (wrong offset, missed padding, bad inflate, broken LZW) and an
    // encoder bug (wrong stride, wrong block framing) both break the
    // match.
    // Decoded CONTENT stats live in q_multimodal_content (not
    // SQL-reachable).
    "q_multimodal_meta" -> QueryDef(
      (s, dir) => extractFeatures(assets(s, dir)).toDF()
        .select(col("asset_id"), col("kind"), col("byte_len"),
          col("width"), col("height"), col("n_frames"), col("sample_rate"))
        .orderBy("asset_id"),
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    CASE doc_id % 5 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      WHEN 2 THEN 'video' WHEN 3 THEN 'png' ELSE 'gif' END AS kind,
             |    n_chars % 31 + 2 AS iw, n_chars % 23 + 2 AS ih,
             |    n_chars % 997 + 64 AS ns,
             |    (n_chars % 15 + 1) * 2 AS vw, (n_chars % 11 + 1) * 2 AS vh,
             |    n_chars % 16 + 1 AS nf,
             |    n_chars % 29 + 2 AS pw, n_chars % 19 + 2 AS ph,
             |    3 + n_chars % 2 AS pch,
             |    n_chars % 21 + 2 AS gw, n_chars % 13 + 2 AS gh,
             |    n_chars % 8 + 1 AS gnf
             |  FROM documents),
             |g2 AS (
             |  SELECT *, ph * (1 + pw * pch) AS praw,
             |    gw * gh + 2 + (gw * gh - 1) // 254 AS gcodes
             |  FROM g),
             |g3 AS (
             |  SELECT *, (9 * gcodes + 7) // 8 AS gdb FROM g2)
             |SELECT doc_id AS asset_id, kind,
             |  CAST(CASE kind
             |    WHEN 'image' THEN 54 + ((3 * iw + 3) // 4) * 4 * ih
             |    WHEN 'audio' THEN 44 + 2 * ns
             |    WHEN 'png' THEN 57 + praw + 6 + 5 * ((praw + 65534) // 65535)
             |    WHEN 'gif' THEN 782
             |      + gnf * (20 + gdb + (gdb + 254) // 255)
             |    ELSE 37 + length(CAST(vw AS VARCHAR)) + length(CAST(vh AS VARCHAR))
             |         + nf * (6 + vw * vh * 3 // 2)
             |  END AS BIGINT) AS byte_len,
             |  CAST(CASE kind WHEN 'image' THEN iw WHEN 'png' THEN pw
             |    WHEN 'gif' THEN gw WHEN 'audio' THEN 0 ELSE vw END AS INTEGER) AS width,
             |  CAST(CASE kind WHEN 'image' THEN ih WHEN 'png' THEN ph
             |    WHEN 'gif' THEN gh WHEN 'audio' THEN 0 ELSE vh END AS INTEGER) AS height,
             |  CAST(CASE kind WHEN 'image' THEN 1 WHEN 'png' THEN 1
             |    WHEN 'gif' THEN gnf WHEN 'audio' THEN ns ELSE nf END AS INTEGER) AS n_frames,
             |  CAST(CASE kind WHEN 'audio' THEN 16000 ELSE 0
             |    END AS INTEGER) AS sample_rate
             |FROM g3 ORDER BY asset_id""".stripMargin)),

    // Decoded-content features (mean pixel/sample/luma + content
    // hash) through the real codec — HASH-CHECKED since r8, retiring
    // "byte-level folds over decoded planes are not SQL-expressible":
    // the decoded planes ARE the generator's closed-form cycle bytes
    // (the q_multimodal_pixels identity), so the oracle rebuilds every
    // plane byte as a SQL list ((ascii(text[i % L + 1]) + salt) % 256
    // per kind — audio as (0, a+128) little-endian PCM16 pairs, gif/
    // y4m as salt-per-frame concatenations) and replays the exact
    // polynomial content hash (h = 31·h + b, seed 1125899906842597,
    // mod 2⁶⁴) via a HUGEINT list_reduce with a final
    // two's-complement fold back to BIGINT. A decoder bug (wrong
    // plane order, missed filter, broken LZW) breaks the hash match
    // byte-for-byte; the codec battery (MediaCodecSpec) still pins
    // the formats against hand-built files.
    "q_multimodal_content" -> QueryDef(
      (s, dir) => extractFeatures(assets(s, dir)).toDF()
        .select(col("asset_id"), col("kind"), col("byte_len"),
          round(col("mean_val"), 4).as("mean_val"), col("content_hash"))
        .orderBy("asset_id"),
      Some("""WITH g AS (
             |  SELECT doc_id, text, length(text) AS L,
             |    CASE doc_id % 5 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             |      WHEN 2 THEN 'video' WHEN 3 THEN 'png' ELSE 'gif' END AS kind,
             |    n_chars % 31 + 2 AS iw, n_chars % 23 + 2 AS ih,
             |    n_chars % 997 + 64 AS ns,
             |    (n_chars % 15 + 1) * 2 AS vw, (n_chars % 11 + 1) * 2 AS vh,
             |    n_chars % 16 + 1 AS nf,
             |    n_chars % 29 + 2 AS pw, n_chars % 19 + 2 AS ph,
             |    3 + n_chars % 2 AS pch,
             |    n_chars % 21 + 2 AS gw, n_chars % 13 + 2 AS gh,
             |    n_chars % 8 + 1 AS gnf
             |  FROM documents),
             |g2 AS (
             |  SELECT *, ph * (1 + pw * pch) AS praw,
             |    gw * gh + 2 + (gw * gh - 1) // 254 AS gcodes
             |  FROM g),
             |g3 AS (SELECT *, (9 * gcodes + 7) // 8 AS gdb FROM g2),
             |bytes AS MATERIALIZED (
             |  SELECT doc_id, kind,
             |    CASE kind
             |      WHEN 'image' THEN
             |        list_transform(range(0, iw * ih * 3),
             |          i -> ascii(substring(text, CAST(i % L AS INTEGER) + 1, 1)))
             |      WHEN 'png' THEN
             |        list_transform(range(0, pw * ph * pch),
             |          i -> ascii(substring(text, CAST(i % L AS INTEGER) + 1, 1)))
             |      WHEN 'gif' THEN
             |        flatten(list_transform(range(0, gnf),
             |          f -> list_transform(range(0, gw * gh),
             |            i -> CAST((ascii(substring(text, CAST(i % L AS INTEGER) + 1, 1)) + f) % 256 AS BIGINT))))
             |      WHEN 'audio' THEN
             |        flatten(list_transform(range(0, ns),
             |          i -> [CAST(0 AS BIGINT),
             |                CAST(ascii(substring(text, CAST(i % L AS INTEGER) + 1, 1)) + 128 AS BIGINT)]))
             |      ELSE
             |        flatten(list_transform(range(0, nf),
             |          f -> list_transform(range(0, vw * vh),
             |            i -> CAST((ascii(substring(text, CAST(i % L AS INTEGER) + 1, 1)) + f) % 256 AS BIGINT))))
             |    END AS bs
             |  FROM g3),
             |hashed AS MATERIALIZED (
             |  SELECT doc_id,
             |    list_reduce(
             |      list_prepend(CAST(1125899906842597 AS HUGEINT),
             |        list_transform(bs, x -> CAST(x AS HUGEINT))),
             |      (acc, x) -> (31 * acc + x) % CAST(18446744073709551616 AS HUGEINT)) AS hu
             |  FROM bytes),
             |means AS (
             |  SELECT b.doc_id,
             |    CASE g.kind
             |      WHEN 'audio' THEN CAST(list_sum(list_transform(range(0, g.ns),
             |          i -> (128 - ascii(substring(g.text, CAST(i % g.L AS INTEGER) + 1, 1))) * 256)) AS DOUBLE) / g.ns
             |      WHEN 'video' THEN CAST(list_sum(list_transform(range(0, g.vw * g.vh),
             |          i -> ascii(substring(g.text, CAST(i % g.L AS INTEGER) + 1, 1)))) AS DOUBLE) / (g.vw * g.vh)
             |      ELSE CAST(list_sum(b.bs) AS DOUBLE) / len(b.bs)
             |    END AS mean_val
             |  FROM bytes b JOIN g3 g USING (doc_id))
             |SELECT g.doc_id AS asset_id, g.kind,
             |  CAST(CASE g.kind
             |    WHEN 'image' THEN 54 + ((3 * g.iw + 3) // 4) * 4 * g.ih
             |    WHEN 'audio' THEN 44 + 2 * g.ns
             |    WHEN 'png' THEN 57 + g.praw + 6 + 5 * ((g.praw + 65534) // 65535)
             |    WHEN 'gif' THEN 782 + g.gnf * (20 + g.gdb + (g.gdb + 254) // 255)
             |    ELSE 37 + length(CAST(g.vw AS VARCHAR)) + length(CAST(g.vh AS VARCHAR))
             |         + g.nf * (6 + g.vw * g.vh * 3 // 2)
             |  END AS BIGINT) AS byte_len,
             |  round(m.mean_val, 4) AS mean_val,
             |  CAST(CASE WHEN h.hu >= CAST(9223372036854775808 AS HUGEINT)
             |       THEN h.hu - CAST(18446744073709551616 AS HUGEINT)
             |       ELSE h.hu END AS BIGINT) AS content_hash
             |FROM g3 g JOIN hashed h USING (doc_id) JOIN means m ON m.doc_id = g.doc_id
             |ORDER BY asset_id""".stripMargin)),

    // Decoded AUDIO CONTENT, hash-checked — the meta-oracle pattern
    // extended to content: the Spark side parses the real RIFF/WAV
    // container and folds the decoded PCM16 samples (RMS, mean |s|,
    // peak, zero crossings), while the oracle re-derives every sample
    // arithmetically from the generator's parameters (the fixture text
    // is pure ASCII, so sample i = (ascii(text[i mod L]) − 128)·256 is
    // SQL-computable). All folds are exact-integer sums below 2^53
    // (order-free) plus one correctly-rounded sqrt, so a decoder bug
    // (wrong offset, wrong endianness, dropped samples) and an encoder
    // bug both break the match.
    "q_multimodal_audio" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        assets(s, dir).filter(_.kind == "audio").mapPartitions { it =>
          def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          it.map { a =>
            val wav = MediaCodec.decodeWav(a.payload)
            val n = wav.samples.length
            var sumsq = 0.0; var sumabs = 0.0
            var peak = 0L; var zc = 0L
            var i = 0
            while (i < n) {
              val v = wav.samples(i).toDouble
              sumsq += v * v; sumabs += math.abs(v)
              val av = math.abs(wav.samples(i).toInt).toLong
              if (av > peak) peak = av
              if (i > 0 && ((wav.samples(i - 1) < 0) != (wav.samples(i) < 0)))
                zc += 1
              i += 1
            }
            (a.asset_id, n.toLong,
              r4(math.sqrt(sumsq / n) + 1e-9), r4(sumabs / n + 1e-9),
              peak, zc)
          }
        }.toDF("asset_id", "n_samples", "rms", "mean_abs", "peak",
            "zero_crossings")
          .orderBy("asset_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id, text,
             |    CAST(n_chars % 997 + 64 AS INTEGER) AS n,
             |    length(text) AS L
             |  FROM documents WHERE doc_id % 5 = 1),
             |s AS (
             |  SELECT doc_id, i.i AS i,
             |    CAST((ascii(substring(text, CAST(i.i % L AS INTEGER) + 1, 1)) - 128) * 256
             |      AS DOUBLE) AS v
             |  FROM a, LATERAL (SELECT unnest(range(0, n)) AS i) i),
             |w AS (
             |  SELECT doc_id, i, v,
             |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
             |  FROM s)
             |SELECT doc_id AS asset_id,
             |  CAST(count(*) AS BIGINT) AS n_samples,
             |  round(sqrt(sum(v * v) / count(*)) + 1e-9, 4) AS rms,
             |  round(sum(abs(v)) / count(*) + 1e-9, 4) AS mean_abs,
             |  CAST(max(abs(v)) AS BIGINT) AS peak,
             |  CAST(sum(CASE WHEN pv IS NOT NULL AND (pv < 0) <> (v < 0)
             |    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
             |FROM w GROUP BY doc_id ORDER BY asset_id""".stripMargin)),

    // Decoded PIXEL CONTENT for every visual kind, hash-checked — the
    // q_multimodal_audio trick generalized: the Spark side decodes the
    // real container (BMP rows, PNG inflate+filters, GIF LZW, Y4M
    // planes) and sums the decoded bytes exactly (integer sums, order-
    // free), while the oracle computes the same sums in CLOSED FORM
    // from the generator's cycle structure: a plane of N bytes filled
    // by cycling the doc's ASCII text is ⌊N/L⌋·S + P(N mod L) for
    // total char-sum S and prefix sums P, and the per-frame salt adds
    // plane·nf·(nf−1)/2 across an animation. One decoded byte out of
    // place anywhere in any codec breaks the per-asset mean.
    "q_multimodal_pixels" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        assets(s, dir).filter(_.kind != "audio").mapPartitions { it =>
          def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
          def fold(planes: Iterator[Array[Byte]]): (Long, Long) = {
            var n = 0L; var sum = 0L
            planes.foreach { p =>
              var i = 0
              while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
              n += p.length
            }
            (n, sum)
          }
          it.map { a =>
            val (n, sum) = a.kind match {
              case "image" => fold(Iterator(MediaCodec.decodeBmp(a.payload).pixels))
              case "png" => fold(Iterator(MediaCodec.decodePng(a.payload).pixels))
              case "gif" =>
                fold(MediaCodec.decodeGif(a.payload).frames.iterator.map(_.pixels))
              case _ =>
                fold(MediaCodec.decodeY4m(a.payload).frames.iterator.map(_.y))
            }
            (a.asset_id, a.kind, n, r4(sum.toDouble / n + 1e-9))
          }
        }.toDF("asset_id", "kind", "n_values", "mean_val")
          .orderBy("asset_id")
      },
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    CASE doc_id % 5 WHEN 0 THEN 'image' WHEN 2 THEN 'video'
             |      WHEN 3 THEN 'png' ELSE 'gif' END AS kind,
             |    text, length(text) AS L,
             |    CAST(CASE doc_id % 5
             |      WHEN 0 THEN (n_chars % 31 + 2) * (n_chars % 23 + 2) * 3
             |      WHEN 2 THEN ((n_chars % 15 + 1) * 2) * ((n_chars % 11 + 1) * 2)
             |      WHEN 3 THEN (n_chars % 29 + 2) * (n_chars % 19 + 2) * (3 + n_chars % 2)
             |      ELSE (n_chars % 21 + 2) * (n_chars % 13 + 2)
             |    END AS BIGINT) AS plane,
             |    CAST(CASE doc_id % 5
             |      WHEN 2 THEN n_chars % 16 + 1
             |      WHEN 4 THEN n_chars % 8 + 1
             |      ELSE 1 END AS BIGINT) AS nf
             |  FROM documents WHERE doc_id % 5 <> 1),
             |chars AS (
             |  SELECT doc_id, k.k AS k,
             |    ascii(substring(text, CAST(k.k AS INTEGER), 1)) AS c
             |  FROM a, LATERAL (SELECT unnest(range(1, L + 1)) AS k) k),
             |tot AS (SELECT doc_id, sum(c) AS S FROM chars GROUP BY doc_id),
             |pre AS (
             |  SELECT doc_id, k,
             |    sum(c) OVER (PARTITION BY doc_id ORDER BY k) AS P
             |  FROM chars),
             |base AS (
             |  SELECT a.doc_id, a.kind, a.plane, a.nf,
             |    (a.plane // a.L) * t.S + coalesce(p.P, 0) AS plane_sum
             |  FROM a JOIN tot t ON t.doc_id = a.doc_id
             |  LEFT JOIN pre p ON p.doc_id = a.doc_id AND p.k = a.plane % a.L)
             |SELECT doc_id AS asset_id, kind,
             |  CAST(plane * nf AS BIGINT) AS n_values,
             |  round(CAST(nf * plane_sum + plane * nf * (nf - 1) // 2 AS DOUBLE)
             |        / (plane * nf) + 1e-9, 4) AS mean_val
             |FROM base ORDER BY asset_id""".stripMargin)),

    // Real frame sampling, PROMOTED r7 to hash-checked: every 4th
    // decoded animation frame (Y4M luma plane / animated-GIF index
    // plane) emits its exact byte count + byte sum, which the oracle
    // re-derives in closed form (frame f's plane sums to
    // base(plane) + f·plane under the generator's cycle+salt
    // structure — the q_multimodal_pixels construction, per frame).
    // The md5 plane fingerprints this row previously carried live on
    // in [[sampleFrames]] (and content hashing in
    // q_multimodal_content); what the driver now verifies is that the
    // SAMPLED FRAME SET and every decoded byte behind it are right.
    "q_multimodal_frames" -> QueryDef(
      (s, dir) => sampleFrameStats(assets(s, dir))
        .orderBy("asset_id", "frame_idx"),
      Some("""WITH a AS (
             |  SELECT doc_id,
             |    text, length(text) AS L,
             |    CAST(CASE doc_id % 5
             |      WHEN 2 THEN ((n_chars % 15 + 1) * 2) * ((n_chars % 11 + 1) * 2)
             |      ELSE (n_chars % 21 + 2) * (n_chars % 13 + 2)
             |    END AS BIGINT) AS plane,
             |    CAST(CASE doc_id % 5
             |      WHEN 2 THEN n_chars % 16 + 1
             |      ELSE n_chars % 8 + 1 END AS BIGINT) AS nf
             |  FROM documents WHERE doc_id % 5 IN (2, 4)),
             |chars AS (
             |  SELECT doc_id, k.k AS k,
             |    ascii(substring(text, CAST(k.k AS INTEGER), 1)) AS c
             |  FROM a, LATERAL (SELECT unnest(range(1, L + 1)) AS k) k),
             |tot AS (SELECT doc_id, sum(c) AS S FROM chars GROUP BY doc_id),
             |pre AS (
             |  SELECT doc_id, k,
             |    sum(c) OVER (PARTITION BY doc_id ORDER BY k) AS P
             |  FROM chars),
             |base AS (
             |  SELECT a.doc_id, a.plane, a.nf,
             |    (a.plane // a.L) * t.S + coalesce(p.P, 0) AS plane_sum
             |  FROM a JOIN tot t ON t.doc_id = a.doc_id
             |  LEFT JOIN pre p ON p.doc_id = a.doc_id AND p.k = a.plane % a.L)
             |SELECT doc_id AS asset_id, CAST(f.f AS BIGINT) AS frame_idx,
             |  CAST(plane AS BIGINT) AS frame_len,
             |  CAST(plane_sum + f.f * plane AS BIGINT) AS frame_sum
             |FROM base, LATERAL (SELECT unnest(range(0, nf, 4)) AS f) f
             |ORDER BY asset_id, frame_idx""".stripMargin))
  )
}
