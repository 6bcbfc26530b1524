package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal AVI (RIFF) video container codec — pure JVM, no external
  * libraries. Two frame encodings, both REAL:
  *
  *  - `00db` raw-DIB frames: 24-bit BGR rows, bottom-up, 4-byte-padded
  *    (fourcc `DIB `) — the uncompressed layout every AVI tool accepts;
  *  - `00dc` MJPEG frames: one baseline JPEG per chunk (fourcc `MJPG`),
  *    decoded through `javax.imageio`'s in-JVM JPEG codec.
  *
  * This is the video analog of the image (`javax.imageio`) and audio
  * (`javax.sound.sampled`) decode paths: the container walk, the header
  * fields (fps, frame count, geometry) and the per-frame pixel decode are
  * all computed from the actual bytes. Reference models media only as
  * opaque payloads; this whole modality is a graft extension.
  */
object AviCodec {

  /** Parsed stream header facts. */
  case class AviHeader(width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Long, fps: Double, handler: String)

  /** One decoded frame: pixel lumas reduced to the features the pipeline
    * keeps (full bitmaps never leave the decoder).
    */
  case class DecodedFrame(index: Int, width: Int, height: Int,
      meanLuma: Double)

  // ---- little-endian readers -------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Chunks of a RIFF region as (id, dataOffset, dataLen); LIST chunks are
    * reported with their list TYPE as id and the region after the type
    * fourcc as data. Chunk data is word-aligned per the RIFF spec.
    */
  private def chunks(b: Array[Byte], start: Int, end: Int)
      : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var pos = start
    def hasNext: Boolean = pos + 8 <= end
    def next(): (String, Int, Int) = {
      val id = fourcc(b, pos)
      val len = u32(b, pos + 4).toInt
      val dataOff = pos + 8
      pos = dataOff + len + (len & 1)   // word alignment
      if (id == "LIST") (fourcc(b, dataOff), dataOff + 4, len - 4)
      else (id, dataOff, len)
    }
  }

  /** Parse the container: header facts + the frame chunks' byte ranges
    * (id, offset, length) in stream order. Refuses loudly on anything
    * that is not a RIFF/AVI — silently faking features for an
    * undecodable payload is the wrong-answer class.
    */
  def parse(b: Array[Byte]): (AviHeader, Seq[(String, Int, Int)]) = {
    require(b.length >= 12 && fourcc(b, 0) == "RIFF" &&
      fourcc(b, 8) == "AVI ", "payload is not a RIFF/AVI container")
    var width = 0; var height = 0; var nFrames = 0
    var usec = 0L; var fps = 0.0; var handler = ""
    val frames = Seq.newBuilder[(String, Int, Int)]
    chunks(b, 12, math.min(b.length, 8 + u32(b, 4).toInt)).foreach {
      case ("hdrl", off, len) =>
        chunks(b, off, off + len).foreach {
          case ("avih", o, _) =>
            usec = u32(b, o)
            nFrames = u32(b, o + 16).toInt
            width = u32(b, o + 32).toInt
            height = u32(b, o + 36).toInt
          case ("strl", o, l) =>
            chunks(b, o, o + l).foreach {
              case ("strh", so, _) if fourcc(b, so) == "vids" =>
                handler = fourcc(b, so + 4).trim
                val scale = u32(b, so + 20)
                val rate = u32(b, so + 24)
                if (scale > 0) fps = rate.toDouble / scale
              case _ => ()
            }
          case _ => ()
        }
      case ("movi", off, len) =>
        chunks(b, off, off + len).foreach {
          case (id, o, l) if id.endsWith("db") || id.endsWith("dc") =>
            frames += ((id, o, l))
          case _ => ()
        }
      case _ => ()   // idx1 and unknown chunks: index not needed, we stream
    }
    require(width > 0 && height > 0, "AVI lacks a vids stream geometry")
    (AviHeader(width, height, nFrames, usec, fps, handler), frames.result())
  }

  /** Decode every frame's pixels to features: raw-DIB chunks are read
    * directly (BGR bottom-up, rows padded to 4 bytes), MJPEG chunks go
    * through the JVM JPEG codec. The iterator decodes lazily — frame
    * sampling skips payload decode entirely for unsampled MJPEG frames
    * (raw chunks are O(1) to skip by construction).
    */
  def decodeFrames(b: Array[Byte]): (AviHeader, Iterator[DecodedFrame]) =
    decodeSampledFrames(b, _ => true)

  /** Like [[decodeFrames]] but only frames whose index passes `keep` are
    * pixel-decoded — the sampling path never pays for skipped frames.
    */
  def decodeSampledFrames(b: Array[Byte], keep: Int => Boolean)
      : (AviHeader, Iterator[DecodedFrame]) = {
    val (hdr, frames) = parse(b)
    val it = frames.iterator.zipWithIndex
      .filter { case (_, i) => keep(i) }
      .map { case ((id, off, len), i) =>
        if (id.endsWith("db"))
          decodeDib(b, off, len, hdr.width, hdr.height, i)
        else decodeJpeg(b, off, len, i)
      }
    (hdr, it)
  }

  private def decodeDib(b: Array[Byte], off: Int, len: Int, w: Int, h: Int,
      idx: Int): DecodedFrame = {
    val rowBytes = (w * 3 + 3) & ~3
    require(len >= rowBytes * h,
      s"raw-DIB frame $idx truncated: $len bytes for ${w}x$h")
    var sum = 0.0
    var y = 0
    while (y < h) {
      val row = off + y * rowBytes
      var x = 0
      while (x < w) {
        val p = row + x * 3
        sum += ((b(p) & 0xff) + (b(p + 1) & 0xff) + (b(p + 2) & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    DecodedFrame(idx, w, h, sum / (w.toLong * h))
  }

  private def decodeJpeg(b: Array[Byte], off: Int, len: Int, idx: Int)
      : DecodedFrame = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      java.util.Arrays.copyOfRange(b, off, off + len)))
    require(img != null, s"undecodable MJPEG frame $idx")
    val w = img.getWidth; val h = img.getHeight
    var sum = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    DecodedFrame(idx, w, h, sum / (w.toLong * h))
  }

  // ---- encoder (fixture/ingest writer — the same container, in reverse)

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }

  private def le32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"), 0, 4)

  /** Author an AVI holding the given frame payloads. `compressed = false`
    * writes `00db` raw-DIB chunks under handler `DIB `; `true` writes
    * `00dc` chunks under `MJPG` (payloads must then be JPEG images).
    */
  def encode(framePayloads: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int, compressed: Boolean): Array[Byte] = {
    require(framePayloads.nonEmpty && width > 0 && height > 0 && fps > 0)
    val n = framePayloads.size
    val maxLen = framePayloads.map(_.length).max

    val strf = new ByteArrayOutputStream()        // BITMAPINFOHEADER
    le32(strf, 40); le32(strf, width); le32(strf, height)
    le16(strf, 1); le16(strf, 24)
    if (compressed) cc(strf, "MJPG") else le32(strf, 0)
    le32(strf, ((width * 3 + 3) & ~3).toLong * height)
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)

    val strh = new ByteArrayOutputStream()
    cc(strh, "vids"); cc(strh, if (compressed) "MJPG" else "DIB ")
    le32(strh, 0); le16(strh, 0); le16(strh, 0)   // flags, prio, lang
    le32(strh, 0)                                  // initial frames
    le32(strh, 1); le32(strh, fps.toLong)          // scale, rate
    le32(strh, 0); le32(strh, n.toLong)            // start, length
    le32(strh, maxLen.toLong); le32(strh, 0xFFFFFFFFL)  // bufsize, quality
    le32(strh, 0)                                  // sample size
    le16(strh, 0); le16(strh, 0); le16(strh, width); le16(strh, height)

    val avih = new ByteArrayOutputStream()
    le32(avih, 1000000L / fps); le32(avih, 0); le32(avih, 0)
    le32(avih, 0x10)                               // AVIF_HASINDEX
    le32(avih, n.toLong); le32(avih, 0); le32(avih, 1)
    le32(avih, maxLen.toLong)
    le32(avih, width); le32(avih, height)
    (0 until 4).foreach(_ => le32(avih, 0))

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, id); le32(o, body.length.toLong); o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0)
      o.toByteArray
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      cc(o, "LIST"); le32(o, (body.length + 4).toLong); cc(o, typ)
      o.write(body, 0, body.length)
      o.toByteArray
    }

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val frameId = if (compressed) "00dc" else "00db"
    val movi = new ByteArrayOutputStream()
    val offsets = framePayloads.map { p =>
      val at = movi.size() + 4   // offset from the 'movi' fourcc
      val c = chunk(frameId, p)
      movi.write(c, 0, c.length)
      (at, p.length)
    }
    val moviList = list("movi", movi.toByteArray)

    val idx = new ByteArrayOutputStream()
    offsets.foreach { case (at, len) =>
      cc(idx, frameId); le32(idx, 0x10)   // AVIIF_KEYFRAME
      le32(idx, at.toLong); le32(idx, len.toLong)
    }

    val body = hdrl ++ moviList ++ chunk("idx1", idx.toByteArray)
    val out = new ByteArrayOutputStream()
    cc(out, "RIFF"); le32(out, (body.length + 4).toLong); cc(out, "AVI ")
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Raw-DIB payload of one solid-color frame (BGR bottom-up, padded). */
  def solidDibFrame(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val b = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val p = y * rowBytes + x * 3
        b(p) = (rgb & 0xff).toByte            // B
        b(p + 1) = ((rgb >> 8) & 0xff).toByte // G
        b(p + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** JPEG payload of one solid-color frame (for MJPEG containers). */
  def solidJpegFrame(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
