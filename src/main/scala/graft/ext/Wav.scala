package graft.ext

/** Minimal RIFF/WAVE PCM-16 codec — complete and pure JVM, so the
  * audio modality's decode → feature-extract → resample pipeline runs
  * genuinely on executors (the same upgrade [[Ppm]] gave images;
  * after this, and [[Jpeg]] covering images, only MP3/H.264 remain
  * stubs, and those genuinely cannot exist in a zero-dependency
  * environment).
  *
  * Scope: canonical little-endian RIFF with a 16-byte PCM `fmt `
  * chunk and 16-bit signed samples, any sample rate / channel count.
  * The chunk walker skips unknown chunks (LIST/INFO etc., with the
  * RIFF even-byte pad), so real-world files with metadata decode too.
  * Anything else (float WAV, 8/24-bit, A-law, truncated data) returns
  * None — a malformed payload must degrade to the opaque path, never
  * fail the task.
  */
object Wav {

  /** Decoded clip: interleaved frames, `samples.length` a multiple of
    * `channels`.
    */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(sampleRate > 0 && channels > 0, "bad wav geometry")
    require(samples.length % channels == 0, "ragged final frame")
    def frames: Int = samples.length / channels
  }

  /** Canonical 44-byte-header PCM-16 encoding. */
  def encode(a: Audio): Array[Byte] = {
    val dataLen = a.samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * a.channels * 2) // byte rate
      .putShort((a.channels * 2).toShort)    // block align
      .putShort(16)                          // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(out.putShort)
    out.array()
  }

  /** Parse a RIFF/WAVE payload; None unless it is well-formed PCM-16
    * with a complete data chunk.
    */
  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    buf.getInt // declared RIFF size; tolerated if wrong, chunks decide
    if (tag() != "WAVE") return None

    var fmt: Option[(Int, Int)] = None // (sampleRate, channels)
    var data: Option[Array[Short]] = None
    while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
      val id = tag()
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val start = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort.toInt
          val rate = buf.getInt
          buf.getInt   // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          if (audioFormat != 1 || bits != 16 || channels <= 0 || rate <= 0)
            return None
          fmt = Some((rate, channels))
          buf.position(start + len + (len & 1))
        case "data" =>
          if (len % 2 != 0) return None
          val n = len / 2
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = buf.getShort; i += 1 }
          data = Some(samples)
          if ((len & 1) == 1 && buf.remaining() > 0) buf.get
        case _ =>
          buf.position(buf.position() + len + (len & 1))
      }
    }
    for ((rate, ch) <- fmt; s <- data if s.length % ch == 0)
      yield Audio(rate, ch, s)
  }

  /** Clip length in microseconds (exact integer arithmetic). */
  def durationMicros(a: Audio): Long =
    a.frames.toLong * 1000000L / a.sampleRate

  /** RMS level in milli-units of full scale (0 = silence, 1000 =
    * constant ±32768) — an integer so downstream comparisons are
    * exact.
    */
  def rmsMilli(a: Audio): Long = {
    if (a.samples.isEmpty) return 0L
    var sum = 0.0
    a.samples.foreach(s => sum += s.toDouble * s.toDouble)
    math.round(1000.0 * math.sqrt(sum / a.samples.length) / 32768.0)
  }

  /** Peak absolute sample value. */
  def peak(a: Audio): Int =
    if (a.samples.isEmpty) 0
    else a.samples.iterator.map(s => math.abs(s.toInt)).max

  /** Keep every `factor`-th FRAME (all channels of it) — the
    * nearest-neighbor resample of audio; sample rate drops by the
    * same factor so duration is preserved to rounding.
    */
  def downsample(a: Audio, factor: Int): Audio = {
    require(factor > 0)
    val outFrames = (a.frames + factor - 1) / factor
    val out = new Array[Short](outFrames * a.channels)
    var f = 0
    while (f < outFrames) {
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(f * factor * a.channels + c)
        c += 1
      }
      f += 1
    }
    Audio(math.max(1, a.sampleRate / factor), a.channels, out)
  }
}
