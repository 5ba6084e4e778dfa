package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (training-data-pipeline mandate): media
  * payloads are opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / frame-sample run as partition-local
  * batch transforms.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB ([[StubCodec.decode]]) — what is
  * real and tested is everything Spark-side: the schema contract, the
  * binary payload handling, the typed Dataset boundary, partition-local
  * batch processing (`mapPartitions`, the Scala analog of a
  * Pandas-batch UDF: one iterator per partition, amortized per-batch
  * setup), and the frame-sample explode. Swapping the stub for a real
  * codec changes no plan shape.
  */
object Multimodal extends QueryModule {

  /** The asset row contract: id + opaque payload + typed metadata. */
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
      mean_byte: Double,
      feature_hash: Long)

  /** STUB codec: stands in for libjpeg/ffmpeg/etc. Deterministic pure
    * function of the payload bytes so tests and verify runs are stable.
    * Replace `decode` with a real codec binding in production — the
    * mapPartitions plumbing around it is unchanged.
    */
  object StubCodec {
    def decode(payload: Array[Byte]): (Long, Double, Long) = {
      // ??? <- real codec goes here; deterministic fake below.
      val len = payload.length.toLong
      val mean = if (payload.isEmpty) 0.0 else payload.map(_ & 0xff).sum.toDouble / len
      var h = 1125899906842597L
      payload.foreach(b => h = 31 * h + (b & 0xff))
      (len, mean, h)
    }
  }

  /** Fixture-derived assets: the documents table provides deterministic
    * bytes (UTF-8 of `text`) standing in for media payloads; metadata
    * is derived arithmetically. Real pipelines read payloads from
    * parquet/object-store binary columns with this exact schema.
    */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        ((col("n_chars") % 64 + 1) * 8).cast("int").as("width"),
        ((col("n_chars") % 48 + 1) * 8).cast("int").as("height"),
        (col("n_chars") % 16 + 1).cast("int").as("n_frames"))
      .as[Asset]
  }

  /** Partition-local batch decode: one codec instantiation per
    * partition, streaming over the iterator — the Scala analog of a
    * batched Pandas UDF. No shuffle; scales with input splits.
    */
  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup (a real codec would init here, once)
      it.map { a =>
        val (len, mean, h) = StubCodec.decode(a.payload)
        AssetFeatures(a.asset_id, a.kind, len, mean, h)
      }
    }
  }

  final case class ResizedAsset(
      asset_id: Long,
      kind: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Resize plumbing: partition-local batch transform to a target
    * geometry. The scaler is the STUB (deterministic stride subsample
    * of the payload standing in for a real resampler — swap the body,
    * keep the plumbing); what is real is the typed Dataset boundary,
    * the metadata rewrite, and that the transform is a narrow map (no
    * shuffle, scales with input splits).
    */
  def resizeAssets(assets: Dataset[Asset], targetW: Int, targetH: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition setup (a real scaler would init once here)
      val targetBytes = math.max(1, targetW * targetH / 8)
      it.map { a =>
        // ??? <- real resampler goes here; deterministic stride stub below
        val stride = math.max(1, a.payload.length / targetBytes)
        val out = a.payload.indices.by(stride).map(a.payload).toArray
        ResizedAsset(a.asset_id, a.kind, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling: every k-th frame index per video asset, exploded
    * to one row per sampled frame with a byte-slice "frame" — the plan
    * shape (generator → projection) is identical with real frames.
    */
  def sampleFrames(assetsDf: DataFrame, everyK: Int = 4): DataFrame =
    assetsDf.filter(col("kind") === "video")
      .select(col("asset_id"), col("n_frames"), col("payload"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
          .as(Seq("sample_idx", "frame_idx")))
      .select(col("asset_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * 8 + 1, lit(8)).as("frame_bytes"))

  def entries: Map[String, QueryDef] = Map(

    // Metadata + stub-decoded features; rows-only driver check (binary
    // pipeline, not SQL-expressible in the oracle).
    "q_multimodal_meta" -> QueryDef(
      (s, dir) => extractFeatures(assets(s, dir)).toDF()
        .select(col("asset_id"), col("kind"), col("byte_len"),
          round(col("mean_byte"), 4).as("mean_byte"), col("feature_hash"))
        .orderBy("asset_id"),
      None),

    // Frame sampling plumbing; rows-only check.
    "q_multimodal_frames" -> QueryDef(
      (s, dir) => sampleFrames(assets(s, dir).toDF())
        .select(col("asset_id"), col("frame_idx"),
          md5(col("frame_bytes")).as("frame_md5"))
        .orderBy("asset_id", "frame_idx"),
      None)
  )
}
