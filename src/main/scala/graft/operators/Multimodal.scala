package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media carried as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * IMAGE decode is REAL ([[decodeImage]] — `javax.imageio`, the PNG/BMP/
  * GIF codecs that ship in the JVM), AUDIO is REAL ([[decodeWav]] —
  * `javax.sound.sampled`, the WAV/PCM codec that ships in the JVM), and
  * VIDEO is REAL ([[decodeAvi]] — [[AviCodec]], an AVI/RIFF container
  * walk with raw-DIB and in-JVM MJPEG frame decode). `decodeStub` remains
  * only for modalities with genuinely no JVM codec (e.g. H.264). The
  * Spark-side shape is the same and real — binary column, typed Dataset
  * batches via mapPartitions (the Scala analog of mapInPandas: one
  * iterator per partition, amortizing per-batch decoder setup), explicit
  * output schema, partition-count control for decoder parallelism.
  */
object Multimodal {

  // ImageIO defaults to useCache=true: every ImageIO.read/write goes
  // through a FileCache*ImageStream — a temp FILE created and deleted on
  // DISK per image, even when the payload is an in-memory byte array.
  // All media here is byte-array-backed, so cache in memory instead
  // (identical decode/encode results; removes one file create+delete per
  // image per task — guide §1.2 per-task work).
  javax.imageio.ImageIO.setUseCache(false)

  /** A media row: id + opaque payload + declared modality. */
  case class MediaRecord(doc_id: Long, media: Array[Byte], modality: String)

  /** Extracted features (what a real image/audio decoder would emit). */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      first_byte: Int,
      fake_width: Int,
      fake_height: Int,
      embedding: Array[Float])

  /** STUB decoder: a real implementation would decode image/audio here
    * (e.g. JPEG → pixels). Deterministic stand-in: geometry from payload
    * length, an 8-dim "embedding" from byte moments.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val b = r.media
    val emb = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < b.length) { acc += (b(j) & 0xff); j += 8 }
      (acc % 1000).toFloat / 1000f
    }
    MediaFeatures(r.doc_id, b.length.toLong,
      if (b.isEmpty) -1 else b(0) & 0xff,
      fake_width = (b.length % 640) + 1,
      fake_height = (b.length % 480) + 1,
      embedding = emb)
  }

  /** The pipeline: text → binary payload (stand-in for stored media blobs),
    * repartition for decoder parallelism, batch-decode, typed features out.
    */
  def extractFeatures(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, partitions: Int = 32): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        encode(col(textCol), "UTF-8").as("media"),
        lit("text/plain").as("modality"))
      .as[MediaRecord]
      .repartition(partitions)
      .mapPartitions { batch =>
        // per-partition decoder init would go here (load codec once)
        batch.map(decodeStub)
      }
  }

  /** REAL decoded-image features (via `javax.imageio` — PNG/BMP/GIF
    * codecs ship in the JVM, no external libs). The stub above remains
    * for modalities whose codecs are genuinely absent in this container
    * (e.g. JPEG2000, H.264).
    */
  case class ImageFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_pixels: Long,
      mean_luma: Double,          // mean of (r+g+b)/3 over all pixels
      embedding: Array[Float])    // 8-bin normalized luma histogram

  /** Decode one image payload with the JVM's real codecs. Fails loudly on
    * an undecodable payload — silently emitting fake features for a
    * corrupt image is the wrong-answer class.
    */
  def decodeImage(r: MediaRecord): ImageFeatures = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.media))
    require(img != null,
      s"undecodable image payload for doc ${r.doc_id} (${r.modality})")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0.0
    val hist = new Array[Long](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)) / 3.0
        sum += luma
        hist((luma / 32.0).toInt.min(7)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    ImageFeatures(r.doc_id, w.toLong, h.toLong, n, sum / n,
      hist.map(c => c.toFloat / n))
  }

  /** Batch image decode: the same mapPartitions shape as the stub path
    * (per-partition codec reuse; `ImageIO` readers are looked up once per
    * JVM), real pixels out.
    */
  def extractImageFeatures(media: Dataset[MediaRecord],
      partitions: Int = 32): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions { batch =>
      // per-partition decoder setup point (ImageIO plugin scan is
      // JVM-wide and cached; nothing further to init)
      batch.map(decodeImage)
    }
  }

  /** REAL decoded-audio features (via `javax.sound.sampled` — the WAV/PCM
    * codec that ships in the JVM, no external libs).
    */
  case class AudioFeatures(
      doc_id: Long,
      sample_rate: Double,
      channels: Int,
      n_frames: Long,
      duration_ms: Double,
      rms: Double,                // root-mean-square amplitude in [-1,1]
      zero_crossings: Long,       // sign changes of the mono mix
      embedding: Array[Float])    // 8-segment RMS energy envelope

  /** Decode one WAV payload with the JVM's real codec. 16-bit PCM (the
    * canonical WAV encoding); fails loudly on anything undecodable —
    * silently faking features for a corrupt payload is the wrong-answer
    * class.
    */
  def decodeWav(r: MediaRecord): AudioFeatures = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(r.media))
    try {
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16,
        s"doc ${r.doc_id}: only 16-bit PCM WAV decodes here, " +
          s"got ${fmt.getSampleSizeInBits}-bit")
      val bytes = in.readAllBytes()
      val ch = fmt.getChannels
      val bigEndian = fmt.isBigEndian
      val nFrames = bytes.length / (2 * ch)
      // mono mix in [-1,1): average channels per frame
      val mono = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var c = 0
        var acc = 0.0
        while (c < ch) {
          val i = (f * ch + c) * 2
          val s =
            if (bigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          acc += s / 32768.0
          c += 1
        }
        mono(f) = acc / ch
        f += 1
      }
      var sumSq = 0.0
      var crossings = 0L
      var prevSign = 0
      val seg = new Array[Double](8)
      var i = 0
      while (i < nFrames) {
        val v = mono(i)
        sumSq += v * v
        val sign = if (v > 0) 1 else if (v < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        seg(math.min(7, i * 8 / math.max(1, nFrames))) += v * v
        i += 1
      }
      val segN = math.max(1, nFrames / 8)
      AudioFeatures(r.doc_id, fmt.getSampleRate.toDouble, ch, nFrames.toLong,
        nFrames * 1000.0 / fmt.getSampleRate,
        math.sqrt(sumSq / math.max(1, nFrames)),
        crossings,
        seg.map(e => math.sqrt(e / segN).toFloat))
    } finally in.close()
  }

  /** Batch audio decode — the same mapPartitions batch shape as images. */
  def extractAudioFeatures(media: Dataset[MediaRecord],
      partitions: Int = 32): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions(_.map(decodeWav))
  }

  /** 16-bit mono PCM samples → a WAV container (fixture/ingest writer —
    * the same `javax.sound.sampled` codec, exercised in reverse).
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Float)
      : Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true,
      false)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A resized media row (what an image-resize stage emits). */
  case class ResizedMedia(doc_id: Long, media: Array[Byte],
      width: Int, height: Int)

  /** STUB resize: a real implementation decodes, scales, re-encodes; the
    * stand-in deterministically truncates/pads the payload to the target
    * "pixel" budget so downstream size accounting is exercised for real.
    */
  def resizeStub(r: MediaRecord, width: Int, height: Int): ResizedMedia = {
    val budget = math.max(1, width * height / 64)
    val out = java.util.Arrays.copyOf(r.media, budget)
    ResizedMedia(r.doc_id, out, width, height)
  }

  /** Batch resize with the same mapPartitions shape (decoder init once per
    * partition; rows stream through).
    */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int,
      partitions: Int = 32): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.repartition(partitions)
      .mapPartitions(_.map(resizeStub(_, width, height)))
  }

  /** One sampled frame of a (fake) video payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: every media row fans out to its sampled frames —
    * the row-multiplying shape that matters for partition sizing at scale
    * (a 2-hour video → thousands of frames; the flatMap keeps the fan-out
    * streaming instead of materializing per-row frame arrays). STUB frame
    * extraction: fixed-size payload chunks stand in for decoded frames.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 256,
      everyNth: Int = 2, partitions: Int = 32): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(frameBytes > 0 && everyNth > 0)
    media.repartition(partitions).flatMap { r =>
      val n = math.max(1, r.media.length / frameBytes)
      (0 until n by everyNth).iterator.map { i =>
        val from = i * frameBytes
        val until = math.min(r.media.length, from + frameBytes)
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.media, from, until))
      }
    }
  }

  /** REAL decoded-video features (via [[AviCodec]] — AVI/RIFF container
    * walk plus raw-DIB or in-JVM MJPEG frame decode; no external libs).
    */
  case class VideoFeatures(
      doc_id: Long,
      width: Long,
      height: Long,
      n_frames: Long,
      fps: Double,
      duration_ms: Double,
      mean_luma: Double,          // mean of per-frame mean lumas
      embedding: Array[Float])    // 8-segment per-frame luma envelope

  /** One decoded, sampled video frame (the row-multiplying shape). */
  case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, mean_luma: Double)

  /** Decode one AVI payload: container headers + every frame's pixels.
    * Fails loudly on an undecodable payload, like the image/audio paths.
    */
  def decodeAvi(r: MediaRecord): VideoFeatures = {
    val (hdr, frames) = AviCodec.decodeFrames(r.media)
    val lumas = frames.map(_.meanLuma).toArray
    require(lumas.nonEmpty, s"doc ${r.doc_id}: AVI holds no frames")
    val seg = new Array[Double](8)
    val segN = new Array[Long](8)
    var i = 0
    while (i < lumas.length) {
      val s = math.min(7, i * 8 / math.max(1, lumas.length))
      seg(s) += lumas(i); segN(s) += 1
      i += 1
    }
    VideoFeatures(r.doc_id, hdr.width.toLong, hdr.height.toLong,
      lumas.length.toLong, hdr.fps,
      if (hdr.fps > 0) lumas.length * 1000.0 / hdr.fps else 0.0,
      lumas.sum / lumas.length,
      seg.indices.map(s =>
        if (segN(s) == 0) 0f
        else (seg(s) / segN(s) / 255.0).toFloat).toArray)
  }

  /** Batch video decode — the same mapPartitions batch shape as images
    * and audio.
    */
  def extractVideoFeatures(media: Dataset[MediaRecord],
      partitions: Int = 32): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.repartition(partitions).mapPartitions(_.map(decodeAvi))
  }

  /** REAL frame sampling over AVI payloads: every `everyNth` frame is
    * decoded and emitted as its own row — the flatMap keeps the fan-out
    * streaming (a 2-hour video → thousands of rows, never a per-row
    * array), and unsampled frames are never pixel-decoded.
    */
  def sampleVideoFrames(media: Dataset[MediaRecord], everyNth: Int = 2,
      partitions: Int = 32): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    require(everyNth > 0)
    media.repartition(partitions).flatMap { r =>
      val (_, frames) =
        AviCodec.decodeSampledFrames(r.media, _ % everyNth == 0)
      frames.map(f =>
        VideoFrame(r.doc_id, f.index, f.width, f.height, f.meanLuma))
    }
  }
}
