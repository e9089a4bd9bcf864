package graft.llmops

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media codecs for the multimodal column operators.
  *
  * Three deliberately simple, fully-public container formats — chosen
  * because they decode with zero native/external dependencies, so the
  * decode step in [[Multimodal]] is REAL code, not a stub:
  *
  *  - image: binary PPM (`P6`) — ASCII header + raw RGB24 raster
  *  - audio: WAV (RIFF) PCM16 mono — canonical 44-byte header + samples
  *  - video: YUV4MPEG2 (`.y4m`) — ASCII stream header + per-frame
  *    `FRAME\n` markers + planar YUV 4:2:0 frames
  *
  * Compressed codecs (JPEG/PNG/MP3/H.264) need libraries this container
  * does not ship; they would slot into the same [[sniff]] dispatch and
  * per-format decode entry points without touching the operators. The
  * reference's media surface is frame-file inventory/progress
  * (rendering/monitor.py:88-95); decoding itself is this library's
  * training-data extension.
  *
  * All decoders are defensive (return None on malformed bytes) so a
  * corrupt payload row degrades to a diagnosable null, never a task
  * failure — at 100 TB some payloads WILL be truncated.
  */
object Codecs {

  /** Container detection by magic bytes: `P6` → image, `RIFF` → audio,
    * `YUV4MPEG2` → video; None for anything else. */
  def sniff(bytes: Array[Byte]): Option[String] = {
    def startsWith(prefix: String) = {
      val p = prefix.getBytes(US_ASCII)
      bytes.length >= p.length && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, p.length), p)
    }
    if (bytes == null) None
    else if (startsWith("P6")) Some("image")
    else if (startsWith("RIFF")) Some("audio")
    else if (startsWith("YUV4MPEG2")) Some("video")
    else None
  }

  /** Binary PPM (P6): `P6\n<w> <h>\n<maxval>\n` + w*h*3 RGB bytes. */
  object Ppm {
    final case class Image(width: Int, height: Int, rgb: Array[Byte])

    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "rgb raster size mismatch")
      val header = s"P6\n$width $height\n255\n".getBytes(US_ASCII)
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    def decode(bytes: Array[Byte]): Option[Image] = {
      if (bytes == null || bytes.length < 11) return None
      if (bytes(0) != 'P' || bytes(1) != '6') return None
      // parse three whitespace-separated ASCII ints after the magic
      var pos = 2
      def nextInt(): Int = {
        while (pos < bytes.length && bytes(pos).toChar.isWhitespace) pos += 1
        var v = 0; var any = false
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
        }
        if (any) v else -1
      }
      val w = nextInt(); val h = nextInt(); val maxv = nextInt()
      if (w <= 0 || h <= 0 || maxv != 255) return None
      pos += 1 // single whitespace byte after maxval
      val need = w * h * 3
      if (pos + need > bytes.length) return None
      Some(Image(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + need)))
    }

    /** Rec.601 luma of an RGB24 raster, normalized to [0,1]. */
    def luma(img: Image): Array[Float] = {
      val out = new Array[Float](img.width * img.height)
      var i = 0
      while (i < out.length) {
        val r = img.rgb(3 * i) & 0xff
        val g = img.rgb(3 * i + 1) & 0xff
        val b = img.rgb(3 * i + 2) & 0xff
        out(i) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
        i += 1
      }
      out
    }
  }

  /** WAV (RIFF) PCM16 little-endian mono: canonical 44-byte header. */
  object Wav {
    final case class Audio(sampleRate: Int, samples: Array[Short])

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
        .put("WAVE".getBytes(US_ASCII))
      bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits/sample
      bb.put("data".getBytes(US_ASCII)).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    def decode(bytes: Array[Byte]): Option[Audio] = {
      if (bytes == null || bytes.length < 44) return None
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, US_ASCII)
      }
      if (tag() != "RIFF") return None
      bb.getInt // riff size
      if (tag() != "WAVE") return None
      var sampleRate = -1; var bits = -1; var channels = -1
      // walk chunks until `data`
      while (bb.remaining() >= 8) {
        val id = tag(); val len = bb.getInt
        if (id == "fmt ") {
          val fmtEnd = bb.position() + len
          val audioFormat = bb.getShort
          channels = bb.getShort
          sampleRate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          if (audioFormat != 1) return None // PCM only
          bb.position(fmtEnd)
        } else if (id == "data") {
          if (sampleRate <= 0 || bits != 16 || channels != 1) return None
          val n = math.min(len, bb.remaining()) / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = bb.getShort; i += 1 }
          return Some(Audio(sampleRate, samples))
        } else {
          if (len < 0 || len > bb.remaining()) return None
          bb.position(bb.position() + len)
        }
      }
      None
    }

    /** PCM16 samples normalized to [-1,1]. */
    def normalized(a: Audio): Array[Float] =
      a.samples.map(s => s / 32768.0f)
  }

  /** YUV4MPEG2: `YUV4MPEG2 W<w> H<h> F30:1 Ip A1:1 C420\n` then frames of
    * `FRAME\n` + Y (w*h) + U (w/2*h/2) + V (w/2*h/2).
    *
    * The geometry is intentionally mirrored by the pure-expression frame
    * slicer in [[Multimodal.sampleFrames]]: header length =
    * `length(concat("YUV4MPEG2 W", w, " H", h, " F30:1 Ip A1:1 C420\n"))`
    * and frame stride = `6 + w*h*3/2` — keep [[header]] and [[frameLen]]
    * in sync with that expression. */
  object Y4m {
    final case class Video(width: Int, height: Int, nFrames: Int,
        payload: Array[Byte]) {
      def headerLen: Int = header(width, height).length
      /** Y-plane of frame `i` (grayscale content), without the marker. */
      def framePlaneY(i: Int): Array[Byte] = {
        val off = headerLen + i * frameLen(width, height) + 6
        java.util.Arrays.copyOfRange(payload, off, off + width * height)
      }
    }

    def header(w: Int, h: Int): Array[Byte] =
      s"YUV4MPEG2 W$w H$h F30:1 Ip A1:1 C420\n".getBytes(US_ASCII)

    /** `FRAME\n` marker + YUV 4:2:0 planes. */
    def frameLen(w: Int, h: Int): Int = 6 + w * h + 2 * ((w / 2) * (h / 2))

    /** yuv(i) must yield exactly w*h + 2*(w/2*h/2) plane bytes. */
    def encode(w: Int, h: Int, nFrames: Int, yuv: Int => Array[Byte]): Array[Byte] = {
      val hdr = header(w, h)
      val fl = frameLen(w, h)
      val out = new Array[Byte](hdr.length + nFrames * fl)
      System.arraycopy(hdr, 0, out, 0, hdr.length)
      val marker = "FRAME\n".getBytes(US_ASCII)
      var f = 0
      while (f < nFrames) {
        val base = hdr.length + f * fl
        System.arraycopy(marker, 0, out, base, 6)
        val planes = yuv(f)
        require(planes.length == fl - 6, "frame plane size mismatch")
        System.arraycopy(planes, 0, out, base + 6, planes.length)
        f += 1
      }
      out
    }

    def decode(bytes: Array[Byte]): Option[Video] = {
      if (bytes == null) return None
      val nl = bytes.indexOf('\n'.toByte)
      if (nl < 0) return None
      val hdr = new String(bytes, 0, nl, US_ASCII)
      if (!hdr.startsWith("YUV4MPEG2")) return None
      var w = -1; var h = -1
      hdr.split(' ').foreach { tok =>
        if (tok.startsWith("W")) w = tok.drop(1).toIntOption.getOrElse(-1)
        else if (tok.startsWith("H")) h = tok.drop(1).toIntOption.getOrElse(-1)
      }
      if (w <= 0 || h <= 0) return None
      val fl = frameLen(w, h)
      val body = bytes.length - (nl + 1)
      if (body < 0 || body % fl != 0) return None
      Some(Video(w, h, body / fl, bytes))
    }

    /** Y-plane bytes of frame `i` normalized to [0,1] grayscale. */
    def lumaFrame(v: Video, i: Int): Array[Float] =
      v.framePlaneY(i).map(b => (b & 0xff) / 255.0f)
  }
}
