package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{MultiModal, Wav}

/** The RIFF/WAVE PCM-16 codec is exact: encode→decode roundtrips
  * bit-identically, features match hand-computed values, the chunk
  * walker survives metadata chunks, malformed payloads degrade to the
  * stub path, and the featurize dispatch routes WAV payloads through
  * the real audio pipeline.
  */
class WavSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def clip(n: Int, ch: Int = 1, rate: Int = 8000) = {
    val s = new Array[Short](n * ch)
    (0 until n * ch).foreach(i => s(i) = ((i * 1731) % 65536 - 32768).toShort)
    Wav.Audio(rate, ch, s)
  }

  test("encode/decode roundtrip is exact, mono and stereo") {
    for (ch <- Seq(1, 2); rate <- Seq(8000, 44100)) {
      val a = clip(64, ch, rate)
      val back = Wav.decode(Wav.encode(a)).get
      assert(back.sampleRate == rate && back.channels == ch)
      assert(back.samples.toSeq == a.samples.toSeq)
    }
  }

  test("features match hand-computed values") {
    // constant full-scale-half signal: rms = 1000 * (16384/32768) = 500
    val a = Wav.Audio(1000, 1, Array.fill(500)(16384.toShort))
    assert(Wav.rmsMilli(a) == 500L)
    assert(Wav.peak(a) == 16384)
    assert(Wav.durationMicros(a) == 500000L) // 500 frames at 1 kHz
    assert(Wav.rmsMilli(Wav.Audio(8000, 1, Array.empty[Short])) == 0L)
  }

  test("downsample keeps every 2nd frame and preserves duration") {
    val a = clip(100, ch = 2)
    val half = Wav.downsample(a, 2)
    assert(half.frames == 50 && half.channels == 2)
    assert(half.sampleRate == a.sampleRate / 2)
    assert(Wav.durationMicros(half) == Wav.durationMicros(a))
    (0 until 50).foreach { f =>
      assert(half.samples(f * 2) == a.samples(f * 4))
      assert(half.samples(f * 2 + 1) == a.samples(f * 4 + 1))
    }
  }

  test("chunk walker skips metadata chunks; malformed payloads decode to None") {
    val a = clip(16)
    val canonical = Wav.encode(a)
    // splice a LIST chunk (odd length → padded) between fmt and data
    val head = canonical.slice(0, 36)
    val data = canonical.slice(36, canonical.length)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val withMeta = head ++ junk ++ data
    assert(Wav.decode(withMeta).map(_.samples.toSeq).contains(a.samples.toSeq))

    assert(Wav.decode(Array.empty[Byte]).isEmpty)
    assert(Wav.decode("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Wav.decode(canonical.take(43)).isEmpty)          // truncated header
    val floatFmt = canonical.clone; floatFmt(20) = 3        // IEEE float tag
    assert(Wav.decode(floatFmt).isEmpty)
    val truncated = canonical.take(canonical.length - 2)    // short data chunk
    assert(Wav.decode(truncated).isEmpty)
  }

  test("featurize routes WAV payloads through the real audio path") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(8)
    val media = MultiModal.packWav(docs, sampleRate = 8000, n = 256)
    val feats = MultiModal.featurize(media).collect().sortBy(_.doc_id)
    assert(feats.length == 8)
    feats.foreach { f =>
      assert(f.n_frames == 1) // channel count, not the stub's len%4 math
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      // the thumb is a VALID half-rate wav with half the frames
      val half = Wav.decode(f.thumb).get
      assert(half.frames == 128 && half.sampleRate == 4000)
    }
    // deterministic: a second run is identical
    val again = MultiModal.featurize(media).collect().sortBy(_.doc_id)
    assert(feats.map(f => (f.doc_id, f.checksum, f.brightness)).toSeq ==
      again.map(f => (f.doc_id, f.checksum, f.brightness)).toSeq)
  }
}
