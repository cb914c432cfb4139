package graft.ext

/** Minimal uncompressed-AVI (RIFF 'AVI ', BI_RGB 24-bit DIB frames)
  * codec — complete and pure JVM, making VIDEO the third genuinely
  * decoded modality (after [[Ppm]] images and [[Wav]] audio). The RIFF
  * chunk discipline is the same as Wav's: walk chunks, skip unknown
  * ones with the even-byte pad, and degrade to None on anything
  * malformed or codec-requiring (MJPEG/H.264 etc. stay on
  * [[MultiModal]]'s documented stub path — those genuinely cannot be
  * decoded in a zero-dependency environment; uncompressed DIB can).
  *
  * Scope: single 'vids' stream, BITMAPINFOHEADER with biCompression=0
  * (BI_RGB) and biBitCount=24, frames carried in '00db'/'00dw' chunks
  * inside LIST movi. DIB rows are bottom-up BGR padded to 4 bytes
  * (top-down when biHeight < 0); [[decode]] normalizes every frame to
  * row-major top-down RGB so each frame is directly a [[Ppm.Image]]
  * pixel buffer — per-frame luma and spatial ops reuse the image
  * kernels unchanged.
  */
object Avi {

  /** Decoded clip: `frames` are row-major top-down RGB buffers of
    * `width*height*3` bytes each (exactly [[Ppm.Image]]'s layout).
    */
  final case class Video(
      width: Int, height: Int, microsPerFrame: Int,
      frames: Vector[Array[Byte]]) {
    require(width > 0 && height > 0 && microsPerFrame > 0, "bad avi geometry")
    require(frames.forall(_.length == width * height * 3), "ragged frame")
    def nFrames: Int = frames.length
    def durationMicros: Long = frames.length.toLong * microsPerFrame
    def frame(i: Int): Ppm.Image = Ppm.Image(width, height, frames(i))
  }

  private val FOURCC_RIFF = "RIFF"
  private def fourcc(b: Array[Byte], pos: Int): String =
    if (pos + 4 <= b.length) new String(b, pos, 4, "US-ASCII") else ""

  private def le32(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
      ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)

  /** Row stride of a 24-bit DIB: 3 bytes/px rounded up to 4 bytes. */
  private def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** Parse an uncompressed-AVI payload; None unless it is well-formed
    * BI_RGB 24-bit with at least one complete frame.
    */
  def decode(bytes: Array[Byte]): Option[Video] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != FOURCC_RIFF ||
        fourcc(bytes, 8) != "AVI ") return None

    var microsPerFrame = 0
    var width = 0
    var height = 0   // signed: negative = top-down rows
    var ok = true
    val frames = Vector.newBuilder[Array[Byte]]

    // Walk one chunk run [pos, end); LIST chunks recurse into their
    // payload (after the 4-byte list type), everything else is either
    // consumed by a handler or skipped with the RIFF even-byte pad.
    def walk(start: Int, end: Int): Unit = {
      var pos = start
      while (ok && pos + 8 <= end) {
        val id = fourcc(bytes, pos)
        val len = le32(bytes, pos + 4)
        val body = pos + 8
        if (len < 0 || body + len > end) { ok = false; return }
        id match {
          case "LIST" =>
            if (len >= 4) walk(body + 4, body + len)
          case "avih" =>
            if (len < 40) { ok = false; return }
            microsPerFrame = le32(bytes, body)
            // dwWidth/dwHeight (offsets 32/36) are advisory; strf's
            // BITMAPINFOHEADER is authoritative for the pixel layout
          case "strf" =>
            // first video strf wins; biSize(0) biWidth(4) biHeight(8)
            // biPlanes(12,16-bit) biBitCount(14,16-bit) biCompression(16)
            if (width == 0) {
              if (len < 40) { ok = false; return }
              val biWidth = le32(bytes, body + 4)
              val biHeight = le32(bytes, body + 8)
              val biBitCount =
                (bytes(body + 14) & 0xff) | ((bytes(body + 15) & 0xff) << 8)
              val biCompression = le32(bytes, body + 16)
              if (biWidth <= 0 || biHeight == 0 ||
                  biBitCount != 24 || biCompression != 0) { ok = false; return }
              width = biWidth
              height = biHeight
            }
          case "00db" | "00dw" =>
            if (width == 0) { ok = false; return } // frame before headers
            val h = math.abs(height)
            val st = stride(width)
            if (len < st * h) { ok = false; return }
            val rgb = new Array[Byte](width * h * 3)
            var y = 0
            while (y < h) {
              // bottom-up unless biHeight < 0; DIB stores BGR
              val srcRow = body + (if (height > 0) (h - 1 - y) else y) * st
              var x = 0
              while (x < width) {
                val s = srcRow + x * 3
                val d = (y * width + x) * 3
                rgb(d) = bytes(s + 2)     // R
                rgb(d + 1) = bytes(s + 1) // G
                rgb(d + 2) = bytes(s)     // B
                x += 1
              }
              y += 1
            }
            frames += rgb
          case _ => () // idx1, strh, JUNK, vendor chunks: skip
        }
        pos = body + len + (len & 1)
      }
    }

    walk(12, bytes.length)
    val fs = frames.result()
    if (ok && width > 0 && microsPerFrame > 0 && fs.nonEmpty)
      Some(Video(width, math.abs(height), microsPerFrame, fs))
    else None
  }

  /** Canonical minimal encoding: hdrl(avih + strl(strh,strf)) + movi
    * with one '00db' bottom-up BGR DIB chunk per frame.
    */
  def encode(v: Video): Array[Byte] = {
    val st = stride(v.width)
    val frameLen = st * v.height
    val moviLen = 4 + v.frames.length * (8 + frameLen)
    val strfLen = 40
    val strhLen = 56
    val avihLen = 56
    val strlLen = 4 + 8 + strhLen + 8 + strfLen
    val hdrlLen = 4 + 8 + avihLen + 8 + strlLen
    val riffLen = 4 + 8 + hdrlLen + 8 + moviLen
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = out.put(s.getBytes("US-ASCII"))

    tag("RIFF"); out.putInt(riffLen); tag("AVI ")
    tag("LIST"); out.putInt(hdrlLen); tag("hdrl")
    tag("avih"); out.putInt(avihLen)
    out.putInt(v.microsPerFrame).putInt(0).putInt(0).putInt(0)
    out.putInt(v.frames.length).putInt(0).putInt(1).putInt(0)
    out.putInt(v.width).putInt(v.height)
    out.putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); out.putInt(strlLen); tag("strl")
    tag("strh"); out.putInt(strhLen)
    tag("vids"); tag("DIB ")
    out.putInt(0).putInt(0).putInt(0)          // flags, prio+lang, initial
    out.putInt(v.microsPerFrame).putInt(1000000) // scale, rate (fps = rate/scale)
    out.putInt(0).putInt(v.frames.length)      // start, length
    out.putInt(frameLen).putInt(-1).putInt(0)  // sugBufSize, quality, sampleSize
    out.putShort(0).putShort(0)                // rcFrame left, top
    out.putShort(v.width.toShort).putShort(v.height.toShort)
    tag("strf"); out.putInt(strfLen)
    out.putInt(40).putInt(v.width).putInt(v.height)
    out.putShort(1).putShort(24)               // planes, bitcount
    out.putInt(0).putInt(frameLen)             // BI_RGB, sizeImage
    out.putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); out.putInt(moviLen); tag("movi")
    v.frames.foreach { rgb =>
      tag("00db"); out.putInt(frameLen)
      var y = 0
      while (y < v.height) {
        val srcRow = (v.height - 1 - y) * v.width * 3 // bottom-up
        var x = 0
        while (x < v.width) {
          val s = srcRow + x * 3
          out.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s)) // BGR
          x += 1
        }
        var pad = st - v.width * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y += 1
      }
    }
    out.array()
  }

  /** Mean Rec.709 luma over ALL frames (uniform frame weight — every
    * frame has the same pixel count), in [0,1].
    */
  def meanLuma(v: Video): Double =
    if (v.frames.isEmpty) 0.0
    else v.frames.indices.map(i => Ppm.meanLuma(v.frame(i))).sum / v.nFrames

  /** Keep every `factor`-th frame — temporal nearest-neighbor
    * downsampling; micros/frame grows by the same factor so duration
    * is preserved to rounding (the video analogue of
    * [[Wav.downsample]]).
    */
  def frameSample(v: Video, factor: Int): Video = {
    require(factor > 0)
    Video(v.width, v.height,
      math.min(v.microsPerFrame.toLong * factor, Int.MaxValue).toInt,
      v.frames.indices.collect { case i if i % factor == 0 => v.frames(i) }.toVector)
  }
}
