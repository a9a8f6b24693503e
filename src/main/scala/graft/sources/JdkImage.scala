package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.sources.MultimodalStub.{MediaEncoder, MediaFeature, Region, RegionEncoder, RegionFeature}

/** REAL image decode behind the [[MultimodalStub.MediaEncoder]] boundary —
  * no external dependency: `javax.imageio` ships in the JDK and decodes
  * JPEG/PNG/GIF/BMP. This closes the one reference capability the stub
  * layer only simulated (CLIP's decode step,
  * `/root/reference/SAM/sam_segment_clip_pipeline.py:157-184`,
  * `search_with_segments.py:59-67`): payloads are decoded to actual
  * pixels, bounded-downsampled by the reference's max-side rule, and
  * embedded as a per-channel color histogram — the classic
  * pre-deep-learning image feature, and the same bytes-in/unit-vector-out
  * contract a real model implementation would honor.
  *
  * Scale shape is inherited from the boundary itself: the encoder is
  * constructed once per partition ([[MultimodalStub.decodeAndEmbed]]'s
  * factory), decode runs row-at-a-time inside mapPartitions with no
  * driver involvement, and the output is a typed columnar Dataset feeding
  * retrieval directly.
  */
object JdkImage {

  /** ImageIO's default stream cache is DISK-backed: every read/write on a
    * non-file stream creates (and deletes) a temp file. For in-memory
    * byte-array payloads that is pure overhead — two filesystem round
    * trips per image, which dominated the decode bench (~2× on tiny
    * images). Memory caching is strictly better for the bounded payloads
    * this boundary handles (decode is capped by maxSide anyway). */
  private def disableDiskCache(): Unit = ImageIO.setUseCache(false)
  disableDiskCache()

  /** Decode → bounded downsample → per-channel histogram → (optionally)
    * L2-normalize.
    *
    *  - `bins` per channel; feature = R-hist ++ G-hist ++ B-hist
    *    (dim = 3·bins). Similar images get similar embeddings — the
    *    property retrieval needs and the hash stub lacked.
    *  - `maxSide` reproduces the reference's resize rule (cap the longest
    *    side, preserve aspect): images over the cap are area-averaged
    *    down BEFORE histogramming, so a 50 MP scan costs the same
    *    histogram work as a thumbnail. `width`/`height` report the
    *    ORIGINAL decoded dimensions (the metadata a catalog wants).
    *  - `normalize = false` keeps raw integer pixel counts — exact in
    *    Float up to 2²⁴ — which is what lets a decode-free oracle check
    *    the whole decode path on lossless fixtures (same trick as
    *    [[MultimodalStub.ByteHistogramEncoder]] / `mm_frame_embed`).
    *
    * Undecodable payloads fail loudly (null from `ImageIO.read` →
    * IllegalArgumentException): silently emitting a zero vector would
    * poison downstream retrieval; a production pipeline routes failures
    * to a quarantine via the same try/filter pattern as the JSON source. */
  class JdkImageEncoder(bins: Int = 16, maxSide: Int = 800,
      normalize: Boolean = true) extends MediaEncoder {
    // constructed once per partition on the EXECUTOR — make sure the
    // disk-cache opt-out holds in that JVM too, not just the driver's
    disableDiskCache()
    def encode(id: Long, bytes: Array[Byte]): MediaFeature = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"doc $id: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val scaled =
        if (math.max(w, h) <= maxSide) img
        else {
          val sc = maxSide.toDouble / math.max(w, h)
          val (nw, nh) = (math.max(1, (w * sc).toInt), math.max(1, (h * sc).toInt))
          val out = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
          val g2 = out.createGraphics()
          // scale with the synchronous drawImage(src, x, y, w, h, obs)
          // over the in-memory BufferedImage — getScaledInstance returns
          // an ASYNC ToolkitImage whose pixels the null-observer draw is
          // not spec-guaranteed to have delivered before dispose(), i.e.
          // a potential all-black histogram on a conforming JVM
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, nw, nh, null)
          g2.dispose()
          out
        }
      MediaFeature(id, width = w, height = h,
        feature = rgbHistogram(scaled, bins, normalize))
    }
  }

  /** Per-channel pixel histogram over the WHOLE image (R-hist ++ G-hist
    * ++ B-hist, `bins` each) — the one feature kernel both the whole-image
    * and the per-segment encoders share, so a crop's embedding and a full
    * image's embedding are the same function of their pixels. */
  private def rgbHistogram(img: BufferedImage, bins: Int,
      normalize: Boolean): Array[Float] = {
    val hist = new Array[Float](3 * bins)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        hist(((rgb >> 16 & 0xFF) * bins) / 256) += 1f
        hist(bins + ((rgb >> 8 & 0xFF) * bins) / 256) += 1f
        hist(2 * bins + ((rgb & 0xFF) * bins) / 256) += 1f
        x += 1
      }
      y += 1
    }
    if (normalize) {
      var norm = 0.0
      var j = 0
      while (j < hist.length) { norm += hist(j).toDouble * hist(j); j += 1 }
      val inv = if (norm == 0.0) 0f else (1.0 / math.sqrt(norm)).toFloat
      j = 0
      while (j < hist.length) { hist(j) *= inv; j += 1 }
    }
    hist
  }

  /** Gray-grid feature for PERCEPTUAL HASHING ([[graft.operators.Multimodal]]
    * average-hash dedup): the image is partitioned into a `grid`×`grid`
    * cell lattice (cell of pixel (x,y) = (x·grid div W, y·grid div H) —
    * integer division, replayable in SQL on the fixture pixel formula),
    * and the feature carries each cell's GRAY SUM (gray = r+g+b, no /3 —
    * integer exact) followed by each cell's PIXEL COUNT:
    * `feature = [sum_0..sum_{g²−1}, n_0..n_{g²−1}]`, row-major cells.
    * Everything integer-valued (≤ 765·|cell| ≪ 2²⁴, exact in Float), so
    * the downstream bit rule `sum_i·Σn > Σsum·n_i` runs in pure long
    * arithmetic on both engines. Decode is the same ImageIO path as
    * [[JdkImageEncoder]]; no resize (hash inputs are already bounded
    * upstream; a production variant would downsample first — the hash is
    * resolution-robust by construction because cells average). */
  class GrayGridEncoder(grid: Int = 4) extends MediaEncoder {
    disableDiskCache()
    def encode(id: Long, bytes: Array[Byte]): MediaFeature = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"doc $id: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Float](grid * grid)
      val counts = new Array[Float](grid * grid)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val gray = (rgb >> 16 & 0xFF) + (rgb >> 8 & 0xFF) + (rgb & 0xFF)
          val cell = (y * grid / h) * grid + (x * grid / w)
          sums(cell) += gray.toFloat
          counts(cell) += 1f
          x += 1
        }
        y += 1
      }
      MediaFeature(id, width = w, height = h, feature = sums ++ counts)
    }
  }

  /** REAL pixel segment crop (reference: bbox-from-mask-extent + crop +
    * CLIP per segment, `SAM/sam_segment_clip_pipeline.py:187-200`,
    * `SAM/extract_sam_clip_features.py:81-110`): decode the parent image
    * ONCE, then for each region take the sub-raster view
    * (`BufferedImage.getSubimage` — a zero-copy window over the decoded
    * pixels, no per-crop re-decode or buffer copy) and histogram it with
    * the SAME kernel as the whole-image encoder, so
    * crop-then-embed ≡ embed-of-cropped-image (`MultimodalStubSpec` pins
    * that identity against a re-encoded BMP of the crop).
    *
    * Out-of-bounds boxes fail loudly against the DECODED header
    * dimensions — the box usually comes from a segment model that ran on
    * the same pixels, so a mismatch means the image and its segments
    * drifted (wrong join key, re-encoded payload) and a silent clamp
    * would embed the wrong pixels. */
  class JdkRegionEncoder(bins: Int = 16, normalize: Boolean = true)
      extends RegionEncoder {
    disableDiskCache() // executor JVM too, same as JdkImageEncoder
    def encodeRegions(id: Long, bytes: Array[Byte],
        regions: Seq[Region]): Seq[RegionFeature] = {
      if (regions.isEmpty) return Nil // skip the decode entirely
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"doc $id: payload is not a decodable image")
      regions.map { r =>
        require(r.w > 0 && r.h > 0 && r.x0 >= 0 && r.y0 >= 0 &&
          r.x0 + r.w <= img.getWidth && r.y0 + r.h <= img.getHeight,
          s"doc $id seg ${r.seg_id}: box (${r.x0},${r.y0},${r.w},${r.h}) " +
            s"outside decoded ${img.getWidth}x${img.getHeight}")
        RegionFeature(id, r.seg_id, r.x0, r.y0, r.w, r.h,
          rgbHistogram(img.getSubimage(r.x0, r.y0, r.w, r.h), bins, normalize))
      }
    }
  }

  /** Deterministic 24-bit BMP fixtures — REAL image files (ImageIO-encoded,
    * decodable by any viewer) whose pixels are a pure integer function of
    * `doc_id`, so an engine with no codec can still predict every pixel:
    *
    *   w = 8 + id % 9,  h = 8 + id % 7
    *   r(x,y) = (31·id +  7·x + 13·y) % 256
    *   g(x,y) = (17·id + 11·x +  5·y) % 256
    *   b(x,y) = (23·id +  3·x + 19·y) % 256
    *
    * BMP is uncompressed and 24-bit RGB is lossless, so decode must
    * recover these values EXACTLY — which is what makes `mm_decode_embed`
    * oracle-checkable: DuckDB replays the formula; Spark renders, encodes,
    * DECODES with [[JdkImageEncoder]], and histograms actual pixels. Any
    * header mis-parse, channel swap, or row-order mistake shifts counts
    * and fails the hash. */
  def renderBmpFixtures(ids: DataFrame): Dataset[(Long, Array[Byte])] = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col("doc_id").cast("long")).as[Long].mapPartitions(_.map { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = ((31 * id + 7 * x + 13 * y) % 256).toInt
          val g = ((17 * id + 11 * x + 5 * y) % 256).toInt
          val b = ((23 * id + 3 * x + 19 * y) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "bmp", bos)
      (id, bos.toByteArray)
    })
  }
}
