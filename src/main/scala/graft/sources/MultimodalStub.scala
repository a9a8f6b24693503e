package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** Decode / feature-extract boundary for multimodal payloads.
  *
  * In the reference this is CLIP over image bytes
  * (`/root/reference/extract_clip_features.py:20-35`); the container has
  * no codecs or model weights, so the *codec* is a clearly-marked
  * deterministic fake — but the Spark contract around it is the real
  * thing and is what gets tested:
  *
  *  - `mapPartitions`, not per-row UDF: the "model" is initialized once
  *    per partition (executor-side lazy singleton), the idiom that makes
  *    per-image inference viable on a 1000-executor cluster.
  *  - Iterator→Iterator streaming: no partition materialization, no
  *    driver collect.
  *  - typed output schema (`MediaFeature`) so downstream ops are plain
  *    columnar Spark (the embedding feeds graft_cosine etc. directly).
  */
object MultimodalStub {

  case class MediaFeature(doc_id: Long, width: Int, height: Int,
      feature: Array[Float])

  /** The pluggable bytes→feature boundary: implement this against a real
    * decoder/model (ONNX runtime session, JNI codec, remote endpoint) and
    * pass a FACTORY of it to [[decodeAndEmbed]] — the factory runs once
    * per partition on the executor, so per-model init (weights load,
    * session create) is amortized across the partition's rows, never paid
    * per row and never serialized from the driver. */
  trait MediaEncoder extends Serializable {
    def encode(id: Long, bytes: Array[Byte]): MediaFeature
  }

  /** Stand-in for a real encoder; one instance per partition. */
  class DeterministicEncoder(dim: Int) extends MediaEncoder {
    def encode(id: Long, bytes: Array[Byte]): MediaFeature = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      val f = Array.tabulate(dim)(j =>
        ((h + j * 2654435761L) % 1000 / 1000.0).toFloat)
      MediaFeature(id, width = 640, height = 480, feature = f)
    }
  }

  /** A real CONTENT-DERIVED encoder (no external deps): the L2-normalized
    * histogram of byte values over `dim` equal-width bins — the byte-level
    * analog of the color histogram, the classic pre-deep-learning image
    * feature. Unlike [[DeterministicEncoder]] (a hash — one changed byte
    * decorrelates the whole vector), SIMILAR payloads get SIMILAR
    * embeddings, so retrieval over its features is semantically
    * meaningful: frameEmbed → knnBrute over it ranks near-identical
    * payloads first (`MultimodalStubSpec` drives that end to end). Same
    * contract as the reference's CLIP extraction
    * (`/root/reference/extract_clip_features.py:20-35`): bytes in,
    * unit-norm feature out — swapping in a real model is this class with
    * the histogram loop replaced by a session call. */
  /** @param normalize L2-normalize the histogram (the retrieval-friendly
    *   default). `false` keeps RAW INTEGER bin counts (exact in Float up
    *   to 2²⁴) — the oracle-checkable form: every downstream aggregate
    *   over integer-valued features stays bit-reproducible in any engine,
    *   which is how `mm_frame_embed` gets a DuckDB oracle despite the
    *   float feature column. */
  class ByteHistogramEncoder(dim: Int = 16, normalize: Boolean = true)
      extends MediaEncoder {
    def encode(id: Long, bytes: Array[Byte]): MediaFeature = {
      val hist = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        hist(((bytes(i) & 0xFF) * dim) / 256) += 1f
        i += 1
      }
      if (normalize) {
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += hist(j).toDouble * hist(j); j += 1 }
        val inv = if (norm == 0.0) 0f else (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dim) { hist(j) *= inv; j += 1 }
      }
      MediaFeature(id, width = 0, height = 0, feature = hist)
    }
  }

  /** A segment's bounding box inside its parent image, in decoded-pixel
    * coordinates — the engine-side form of the reference's SAM mask
    * extent (`/root/reference/SAM/extract_sam_clip_features.py:91-99`
    * derives exactly this x0/y0/w/h box from the mask before cropping). */
  case class Region(seg_id: Long, x0: Int, y0: Int, w: Int, h: Int)

  /** One cropped segment's feature row: provenance box + embedding. */
  case class RegionFeature(doc_id: Long, seg_id: Long, x0: Int, y0: Int,
      w: Int, h: Int, feature: Array[Float])

  /** The bytes+regions → per-segment features boundary — the segment leg
    * of the pipeline (reference: mask-apply + bbox crop + CLIP per crop,
    * `SAM/sam_segment_clip_pipeline.py:187-200`). The contract decodes
    * the parent image ONCE and crops every region from the decoded
    * pixels: at n segments/image that is 1 decode + n crops, not n
    * decodes — the shape that matters when decode dominates (it does:
    * JPEG decode is ~10× the histogram cost). Same factory discipline as
    * [[MediaEncoder]]: construct once per partition on the executor. */
  trait RegionEncoder extends Serializable {
    def encodeRegions(id: Long, bytes: Array[Byte],
        regions: Seq[Region]): Seq[RegionFeature]
  }

  /** df must have (doc_id: long, payload: binary, regions:
    * array<struct<seg_id,x0,y0,w,h>>) — one row per IMAGE carrying all
    * its segment boxes, so the executor decodes each payload exactly once
    * and flatMaps its crops ([[RegionEncoder]]'s contract). Getting the
    * regions pre-grouped is the caller's join shape: segments are
    * per-image rows upstream, so `groupBy(doc).collect_list(box)` — or,
    * when boxes are a pure function of the row as in the fixture
    * bindings, a `transform(sequence(...))` with no shuffle at all. */
  def cropAndEmbed(df: DataFrame,
      encoderFactory: () => RegionEncoder): Dataset[RegionFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"),
        col("regions").cast("array<struct<seg_id:bigint,x0:int,y0:int,w:int,h:int>>"))
      .as[(Long, Array[Byte], Seq[Region])]
      .mapPartitions { it =>
        val model = encoderFactory() // once per partition, not per row
        it.flatMap { case (id, bytes, regs) =>
          model.encodeRegions(id, bytes, regs)
        }
      }
  }

  case class ResizedMedia(doc_id: Long, orig_bytes: Long, new_bytes: Long,
      scale: Double, payload: Array[Byte])

  /** Resize stand-in (the reference caps images at 800/1024 px,
    * `/root/reference/SAM/sam_segment_clip_pipeline.py:157-184`): without
    * codecs, "resize to fit budget" is a stride byte-downsample — but the
    * contract is the real one: pure per-row map, payload in / smaller
    * payload out + provenance metadata, streaming through mapPartitions
    * with no materialization. df must have (doc_id: long, payload: binary). */
  def resizeStub(df: DataFrame, maxBytes: Int = 1024): Dataset[ResizedMedia] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val n = bytes.length
        if (n <= maxBytes) ResizedMedia(id, n, n, 1.0, bytes)
        else {
          val stride = math.ceil(n.toDouble / maxBytes).toInt
          val out = Array.tabulate((n + stride - 1) / stride)(i => bytes(i * stride))
          ResizedMedia(id, n, out.length, out.length.toDouble / n, out)
        }
      })
  }

  /** df must have (doc_id: long, payload: binary). `encoderFactory` plugs
    * in a real [[MediaEncoder]]; the default is the deterministic stub. */
  def decodeAndEmbed(df: DataFrame, dim: Int = 16,
      encoderFactory: Option[() => MediaEncoder] = None): Dataset[MediaFeature] = {
    val spark = df.sparkSession
    import spark.implicits._
    val mk = encoderFactory.getOrElse(() => new DeterministicEncoder(dim))
    df.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val model = mk() // once per partition, not per row
        it.map { case (id, bytes) => model.encode(id, bytes) }
      }
  }
}
