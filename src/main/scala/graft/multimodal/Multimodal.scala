package graft.multimodal

import graft.validate.ImageValidate
import java.awt.image.BufferedImage
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise in `mapPartitions` (the Scala
  * analog of `mapInPandas`: one iterator of rows per partition, library
  * calls amortized across the batch, nothing on the driver).
  *
  * Image decode / resize / feature-extract are REAL (JDK javax.imageio
  * handles png+jpeg in this container), as are WAV audio
  * ([[audioFeatures]], javax.sound.sampled), MJPEG-AVI video
  * ([[frameSampleAvi]], RIFF walk + per-frame ImageIO), and animated GIF
  * ([[frameSampleGif]], ImageIO's multi-frame reader). Only containers the
  * JDK cannot decode (mp4/webm/mkv — no codec jar ships here) go through
  * the clearly-marked deterministic STUB [[frameSample]]: its Spark-side
  * plumbing (schema, batch shape, partitioning) is real and tested; the
  * codec call is the single seam to swap in.
  */
object Multimodal {

  final case class ImageMeta(image_id: String, w: Int, h: Int, fmt: String,
      n_bytes: Long, decode_ok: Boolean)

  final case class ImageFeatures(image_id: String,
      mean_r: Double, mean_g: Double, mean_b: Double,
      std_luma: Double, aspect: Double)

  final case class Frame(media_id: String, frame_idx: Int, ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Decode + verify metadata of an images table (binary column → typed). */
  def decodeMeta(spark: SparkSession, images: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        try {
          val img = ImageValidate.decode(bytes)
          ImageMeta(id, img.getWidth, img.getHeight, fmt, bytes.length.toLong, img != null)
        } catch {
          case _: Exception => ImageMeta(id, -1, -1, fmt, bytes.length.toLong, false)
        }
      })
  }

  /** Per-channel feature extraction over decoded pixels. */
  def extractFeatures(spark: SparkSession, images: DataFrame): Dataset[ImageFeatures] = {
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = ImageValidate.decode(bytes)
        val (w, h) = (img.getWidth, img.getHeight)
        var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        ImageFeatures(id, sr / n, sg / n, sb / n,
          math.sqrt(math.max(sl2 / n - (sl / n) * (sl / n), 0.0)), w.toDouble / h)
      })
  }

  /** Bilinear resize (real, Graphics2D) of every image to (tw, th). */
  def resizeAll(spark: SparkSession, images: DataFrame, tw: Int, th: Int): DataFrame = {
    import spark.implicits._
    images.select("image_id", "bytes", "fmt").as[(String, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, fmt) =>
        val src = ImageValidate.decode(bytes)
        val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, tw, th, null)
        g.dispose()
        (id, graft.fixtures.ImageGen.encode(dst, "png"), tw, th)
      }).toDF("image_id", "bytes", "w", "h")
  }

  /** Image+caption quality gate — the LAION-style admission filter a
    * training-data pipeline runs right after decode: drop rows whose image
    * is undecodable, too small, or absurdly elongated, and whose caption is
    * too short/long to supervise anything. Input needs (image_id, w, h,
    * decode_ok, caption) — i.e. [[decodeMeta]] joined back to the source
    * table's caption.
    *
    * Output is (image_id, reason, pass): `reason` names the FIRST failing
    * rule in a fixed cheap-to-expensive order (decode → dims → aspect →
    * caption length), `"ok"` otherwise, so the gate doubles as a rejection
    * census (`groupBy(reason).count` tells a pipeline operator what the
    * crawl is wasting fetches on).
    *
    * Scale shape: pure column expressions — no shuffle, no UDF, one
    * whole-stage-codegen projection; a caller filtering `pass = 1`
    * gets the predicate pushed into the scan of any columnar source that
    * materializes these columns.
    */
  def gateImages(metaWithCaption: DataFrame,
      minW: Int = 64, minH: Int = 64,
      minAspect: Double = 0.5, maxAspect: Double = 2.0,
      minCaptionTokens: Int = 3, maxCaptionTokens: Int = 128): DataFrame = {
    val tokens = size(split(trim(col("caption")), "\\s+"))
    val aspect = col("w").cast("double") / col("h").cast("double")
    val reason = when(!col("decode_ok"), "decode")
      .when(col("w") < minW || col("h") < minH, "too_small")
      .when(aspect < minAspect || aspect > maxAspect, "aspect")
      .when(tokens < minCaptionTokens, "caption_short")
      .when(tokens > maxCaptionTokens, "caption_long")
      .otherwise("ok")
    metaWithCaption.select(col("image_id"), reason.as("reason"))
      .withColumn("pass", (col("reason") === "ok").cast("int"))
  }

  final case class ImagePhash(image_id: String, phash: Long)

  /** 64-bit DCT perceptual hash (the classic pHash scheme): bilinear-resize
    * to 32×32 grayscale → separable 2D DCT-II → keep the lowest 8×8
    * frequency block → bit(u,v) = coefficient > median of the 63 AC
    * coefficients. Robust to re-encoding (PNG↔JPEG), resolution changes and
    * small edits — the image-column analog of SimHash for text, and the
    * right key for crawl-scale image dedup: one 8-byte hash per image,
    * candidate pairs from a banded equi-join, never pixel-space comparison
    * across rows.
    */
  def phash64(img: BufferedImage): Long = {
    val N = 32
    val small = new BufferedImage(N, N, BufferedImage.TYPE_INT_RGB)
    val g2 = small.createGraphics()
    g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g2.drawImage(img, 0, 0, N, N, null)
    g2.dispose()
    val luma = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) {
        val p = small.getRGB(x, y)
        luma(y)(x) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
          0.114 * (p & 0xff)
        x += 1
      }
      y += 1
    }
    // separable DCT-II: rows, then columns (only the first 8 output
    // frequencies of the column pass are needed)
    val cosT = Array.tabulate(N, N)((k, n) => math.cos((2 * n + 1) * k * math.Pi / (2.0 * N)))
    val rows = Array.ofDim[Double](N, 8)
    y = 0
    while (y < N) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < N) { s += luma(y)(x) * cosT(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coefs = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < N) { s += rows(yy)(u) * cosT(v)(yy); yy += 1 }
        coefs(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    // classic pHash: the DC term (coefs(0), overall brightness) is EXCLUDED
    // — bit 0 is forced to 0 and the other 63 bits compare each AC
    // coefficient against the true median of the 63 AC coefficients
    // (odd count ⇒ sorted index 31). Including DC would set a constant bit
    // across all images (DC ≫ the AC median on any natural image), wasting
    // a hash bit and weakening band-0 bucketing.
    val ac = coefs.drop(1).sorted
    val med = ac(31)
    var bits = 0L
    var k = 1
    while (k < 64) {
      if (coefs(k) > med) bits |= (1L << k)
      k += 1
    }
    bits
  }

  /** Perceptual hash per image row (binary column → 8 bytes). */
  def phashAll(spark: SparkSession, images: DataFrame): Dataset[ImagePhash] = {
    import spark.implicits._
    images.select("image_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImagePhash(id, phash64(ImageValidate.decode(bytes)))
      })
  }

  /** Image near-dups via banded pHash: 4 × 16-bit bands of the perceptual
    * hash form equi-join buckets ([[graft.dedup.Dedup.bandedHammingPairs]] —
    * never an all-pairs comparison, hot buckets capped at `maxBucket` with
    * the drop observable via [[phashOversizeBuckets]]), then Hamming
    * verifies. At crawl scale the join carries only (id, band, bh) and the
    * per-image cost is one decode + one 8-byte hash; a solid-color or
    * near-uniform thumbnail flood (common in real crawls) lands in a capped
    * bucket instead of going O(bucket²).
    */
  def phashNearDups(spark: SparkSession, images: DataFrame,
      maxHamming: Int = 6, maxBucket: Long = 1000L): DataFrame =
    graft.dedup.Dedup.bandedHammingPairs(
      phashAll(spark, images).toDF()
        .select(col("image_id").as("id"), col("phash").as("sim")),
      maxHamming, maxBucket)

  /** Cross-modal consistency audit over an image+caption table (the
    * input_hint shape). Uses the STORED phash column — pure columnar, no
    * decode in the plan. Two conflict kinds a caption-supervised training
    * pipeline has to clean:
    *
    *  - `caption_drift`: visually-duplicate pairs (pHash Hamming ≤
    *    `maxHamming`, found via the same capped banded equi-join as every
    *    near-dup operator here) whose captions DIFFER — the same picture
    *    crawled behind two captions; keep one, or the pair teaches the
    *    model two labels for one image.
    *  - `caption_spam`: identical captions on visually-DISTINCT images
    *    (Hamming > `spamHamming`) — boilerplate/SEO captions; pairs come
    *    from an exact caption equi-join (groups > `maxBucket` dropped, the
    *    same observable-cap discipline as the LSH buckets — a megasite's
    *    "product photo" caption cannot go O(group²)).
    *
    * Returns (kind, id1, id2), id1 < id2.
    */
  def crossModalConflicts(images: DataFrame, maxHamming: Int = 6,
      spamHamming: Int = 20, maxBucket: Long = 1000L): DataFrame = {
    val h = images.select(col("image_id").as("id"), col("phash").as("sim"),
      col("caption"))
    val cap = h.select(col("id"), col("caption"))
    val drift = graft.dedup.Dedup.bandedHammingPairs(
        h.select("id", "sim"), maxHamming, maxBucket)
      .join(cap.select(col("id").as("id1"), col("caption").as("c1")), Seq("id1"))
      .join(cap.select(col("id").as("id2"), col("caption").as("c2")), Seq("id2"))
      .filter(col("c1") =!= col("c2"))
      .select(lit("caption_drift").as("kind"), col("id1"), col("id2"))
    val smallGroups = h.groupBy("caption").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("n") <= maxBucket)
      .select("caption")
    val grouped = h.join(smallGroups, Seq("caption"), "left_semi")
    val spam = grouped.select(col("caption"), col("id").as("id1"), col("sim").as("s1"))
      .join(grouped.select(col("caption"), col("id").as("id2"), col("sim").as("s2")),
        Seq("caption"))
      .filter(col("id1") < col("id2") &&
        bit_count(col("s1").bitwiseXOR(col("s2"))) > spamHamming)
      .select(lit("caption_spam").as("kind"), col("id1"), col("id2"))
    drift.unionByName(spam)
  }

  /** Diagnostic: the band buckets [[phashNearDups]] drops as oversize. */
  def phashOversizeBuckets(spark: SparkSession, images: DataFrame,
      maxBucket: Long = 1000L): DataFrame =
    graft.dedup.Dedup.bandedOversizeBuckets(
      phashAll(spark, images).toDF()
        .select(col("image_id").as("id"), col("phash").as("sim")),
      maxBucket)

  final case class AudioFeatures(media_id: String, sample_rate: Int,
      n_samples: Long, rms: Double, peak: Double, zcr_per_sec: Double)

  /** REAL audio decode + features over a WAV binary column — the JDK's own
    * `javax.sound.sampled` handles PCM WAV, so unlike [[frameSample]] this
    * path needs no external codec and is NOT a stub. Batch-wise
    * `mapPartitions`, nothing on the driver: decode → per-clip RMS, peak,
    * zero-crossing rate. For other container formats (mp3/ogg/flac) the
    * `AudioSystem.getAudioInputStream` call is the SPI seam — dropping a
    * codec jar on the classpath extends it with no code change here.
    */
  def audioFeatures(spark: SparkSession, audio: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.select("media_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val in0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        // The feature loop below reads PCM16 MONO. A stereo / 8-bit / 24-bit
        // stream decodes without error but would yield silently wrong
        // n_samples/rms/zcr, so anything else is CONVERTED to the target
        // format first (the JDK's own PCM converter handles sample size,
        // endianness, and channel downmix); an unconvertible format fails
        // loudly here instead of producing plausible garbage.
        val target = new javax.sound.sampled.AudioFormat(
          in0.getFormat.getSampleRate, 16, 1, true, false)
        val in =
          if (in0.getFormat.matches(target)) in0
          else javax.sound.sampled.AudioSystem.getAudioInputStream(target, in0)
        val fmt = in.getFormat
        val raw = in.readAllBytes()
        in.close()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = raw.length / 2
        var (sum2, peak) = (0.0, 0.0)
        var crossings = 0L
        var prev = 0.0
        var k = 0
        while (k < n) {
          val v = bb.getShort(k * 2) / 32767.0
          sum2 += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (k > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) crossings += 1
          prev = v
          k += 1
        }
        val secs = n.toDouble / fmt.getSampleRate
        AudioFeatures(id, fmt.getSampleRate.toInt, n.toLong,
          math.sqrt(sum2 / math.max(n, 1)), peak,
          if (secs > 0) crossings / secs else 0.0)
      })
  }

  final case class VideoFrame(media_id: String, frame_idx: Int, ts_ms: Long,
      w: Int, h: Int, frame_bytes: Array[Byte])

  /** Parsed MJPEG-AVI stream: (scale, rate, ordered 00dc frame payloads) —
    * fps = rate/scale. A strict walk of the RIFF chunk tree; refuses
    * non-AVI bytes loudly.
    */
  private[multimodal] def parseAvi(bytes: Array[Byte]): (Long, Long, Vector[Array[Byte]]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    require(fcc() == "RIFF", "not a RIFF container")
    bb.getInt // riff payload size
    require(fcc() == "AVI ", "RIFF is not an AVI")
    var scale = 1L; var rate = 0L
    val frames = Vector.newBuilder[Array[Byte]]
    def walk(end: Int): Unit = {
      while (bb.position() + 8 <= end) {
        val id = fcc()
        val size = bb.getInt.toLong & 0xffffffffL
        val next = bb.position() + size.toInt + (size % 2).toInt // RIFF pads to even
        if (id == "LIST") {
          fcc() // list type — children identify themselves
          walk(next)
        } else {
          if (id == "strh") {
            val p0 = bb.position()
            if (fcc() == "vids") {
              // body: fccType(4) fccHandler(4) dwFlags(4) wPriority(2)
              //       wLanguage(2) dwInitialFrames(4) dwScale(4) dwRate(4)
              bb.position(p0 + 20)
              scale = bb.getInt.toLong & 0xffffffffL
              rate = bb.getInt.toLong & 0xffffffffL
            }
          } else if (id == "00dc") {
            val a = new Array[Byte](size.toInt); bb.get(a); frames += a
          }
        }
        bb.position(next)
      }
    }
    walk(bytes.length)
    require(rate > 0, "AVI has no vids stream header")
    (scale, rate, frames.result())
  }

  /** REAL frame sampling for MJPEG-in-AVI video — JDK-only, no external
    * codec: a RIFF chunk walk extracts the per-frame JPEG payloads and
    * ImageIO decodes each sampled frame (the same no-codec-needed move as
    * the WAV audio path). Emits every step-th frame where
    * step = max(1, ⌊everyMs · fps / 1000⌋), up to `maxFrames` per clip;
    * ts_ms = frame_idx · 1000 · scale / rate. Batch-wise `mapPartitions`,
    * nothing on the driver. For containers other than AVI/MJPEG see the
    * [[frameSample]] stub seam.
    */
  def frameSampleAvi(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxFrames: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (scale, rate, frames) = parseAvi(bytes)
        val step = math.max(1L, everyMs * rate / (1000L * scale)).toInt
        (0 until frames.length by step).take(maxFrames).iterator.map { fi =>
          val img = ImageValidate.decode(frames(fi))
          VideoFrame(id, fi, fi * 1000L * scale / rate,
            img.getWidth, img.getHeight, frames(fi))
        }
      })
  }

  /** Parsed animated GIF: ordered (frame image, delay in centiseconds).
    * ImageIO's native GIF plugin reads every frame plus its
    * GraphicControlExtension delay; a frame with no GCE gets delay 0 (the
    * GIF89a default). Refuses non-GIF bytes loudly.
    */
  private[multimodal] def parseGif(bytes: Array[Byte]): Vector[(BufferedImage, Int)] = {
    require(bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F',
      "not a GIF")
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        val meta = reader.getImageMetadata(f)
        val root = meta.getAsTree(meta.getNativeMetadataFormatName)
        var delay = 0
        val kids = root.getChildNodes
        var k = 0
        while (k < kids.getLength) {
          val node = kids.item(k)
          if (node.getNodeName == "GraphicControlExtension")
            delay = node.getAttributes.getNamedItem("delayTime").getNodeValue.toInt
          k += 1
        }
        (img, delay)
      }.toVector
    } finally { reader.dispose(); iis.close() }
  }

  /** REAL frame sampling for ANIMATED GIF — the second container the JDK
    * decodes without any codec jar (after [[frameSampleAvi]]'s MJPEG-AVI).
    * GIF timestamps are a running sum of PER-FRAME delays, not an index
    * multiple, so the sampling rule is time-bucketed rather than
    * stride-based: keep the FIRST frame of each `everyMs` bucket
    * (frame f survives iff ⌊ts(f)/everyMs⌋ > ⌊ts(f−1)/everyMs⌋, frame 0
    * always survives), up to `maxFrames` per clip. That rule is a window
    * lag over the cumulative delay sum, so an external SQL oracle replays
    * the SELECTION as well as the timestamps. everyMs ≤ 0 keeps every
    * frame. Batch-wise `mapPartitions`, nothing on the driver.
    */
  def frameSampleGif(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxFrames: Int): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select("media_id", "bytes").as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val frames = parseGif(bytes)
        val ts = frames.scanLeft(0L) { case (acc, (_, d)) => acc + d * 10L }
        val kept = (0 until frames.length).iterator.filter { f =>
          everyMs <= 0 || f == 0 || ts(f) / everyMs > ts(f - 1) / everyMs
        }.take(maxFrames)
        kept.map { f =>
          val img = frames(f)._1
          VideoFrame(id, f, ts(f), img.getWidth, img.getHeight,
            graft.fixtures.ImageGen.encode(img, "png"))
        }
      })
  }

  /** Frame sampling from a video binary column — the seam for containers
    * the JDK cannot decode (mp4/webm/mkv: no codec ships here).
    *
    * STUB for those containers: the "decoder" is a deterministic fake —
    * frame bytes are a seeded function of (media_id, frame_idx). The
    * plumbing around it (fps math, batch iterator shape, output schema) is
    * the real thing a codec jar would slot into at the marked line.
    * AVI/MJPEG input needs no stub — use [[frameSampleAvi]].
    */
  def frameSample(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxFrames: Int): Dataset[Frame] = {
    import spark.implicits._
    media.select("media_id", "duration_ms").as[(String, Long)]
      .mapPartitions(_.flatMap { case (id, durMs) =>
        val n = math.min(maxFrames.toLong, durMs / math.max(everyMs, 1L)).toInt
        (0 until n).iterator.map { i =>
          val ts = i * everyMs
          // >>> STUB: replace with real codec call: decodeFrameAt(bytes, ts)
          val fake = java.nio.ByteBuffer.allocate(16)
            .putLong(graft.functions.GraftHash.mix64(graft.functions.GraftHash.xxhash64(id), ts))
            .putLong(ts).array()
          // <<< STUB
          Frame(id, i, ts, fake)
        }
      })
  }

  /** Default aspect-ratio ladder for [[bucketImages]]: seven (w, h) shapes
    * at a ~256² pixel budget spanning aspect 0.25–4.0 — the SDXL-style
    * bucket set scaled down (the production ladder at 1024² is the same
    * shape ×4). Ordered by ascending width; ties in [[aspectBucket]] break
    * to the EARLIER entry, so the order is part of the contract.
    */
  val DefaultAspectLadder: Seq[(Int, Int)] =
    Seq((128, 512), (192, 320), (224, 288), (256, 256),
      (288, 224), (320, 192), (512, 128))

  /** Aspect-ratio bucket assignment (the training-batch composition step:
    * variable-shape images batch only with same-shape peers, so every image
    * maps to the ladder shape nearest its aspect in LOG space — log distance
    * treats 2:1 and 1:2 symmetrically, plain ratio distance does not).
    * Pure per-row argmin over a ladder literal — the [[graft.search.SimilaritySearch]]
    * cell-assignment shape: no join, no shuffle, codegen'd; at 10^10 rows
    * this is scan speed. Returns struct(bw, bh); first minimum wins on ties.
    */
  def aspectBucket(w: Column, h: Column,
      ladder: Seq[(Int, Int)] = DefaultAspectLadder): Column = {
    val lad = array(ladder.map { case (bw, bh) =>
      struct(lit(bw).as("bw"), lit(bh).as("bh"),
        lit(math.log(bw.toDouble / bh.toDouble)).as("la"))
    }: _*)
    val la = log(w.cast("double") / h.cast("double"))
    aggregate(lad,
      struct(lit(Double.MaxValue).as("d"), lit(0).as("bw"), lit(0).as("bh")),
      (acc, b) => {
        val d = abs(la - b.getField("la"))
        when(d < acc.getField("d"),
          struct(d.as("d"), b.getField("bw").as("bw"), b.getField("bh").as("bh")))
          .otherwise(acc)
      })
  }

  /** (image_id, bucket_w, bucket_h) over a decoded-meta frame — the batch
    * key a shape-bucketed training loader groups on. Census per bucket is a
    * plain groupBy downstream.
    */
  def bucketImages(meta: DataFrame,
      ladder: Seq[(Int, Int)] = DefaultAspectLadder): DataFrame = {
    val b = aspectBucket(col("w"), col("h"), ladder)
    meta.select(col("image_id"), b.getField("bw").as("bucket_w"),
      b.getField("bh").as("bucket_h"))
  }
}
