package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Avi, MultiModal, Ppm}

/** The uncompressed-AVI codec is exact: encode→decode roundtrips
  * bit-identically (including the bottom-up BGR → top-down RGB
  * normalization and 4-byte row padding), per-frame luma matches a
  * hand-computed value, the chunk walker survives junk/idx1 chunks,
  * malformed or compressed payloads degrade to None, and the
  * featurize dispatch routes AVI payloads through the real video
  * pipeline with a decodable temporal-sample thumb.
  */
class AviSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vid(w: Int = 8, h: Int = 6, n: Int = 3, mpf: Int = 40000) = {
    val frames = Vector.tabulate(n) { f =>
      val px = new Array[Byte](w * h * 3)
      px.indices.foreach(i => px(i) = ((f * 97 + i * 31) % 256).toByte)
      px
    }
    Avi.Video(w, h, mpf, frames)
  }

  test("encode/decode roundtrip is exact, incl. padded rows") {
    // width 2 → row = 6 bytes, stride = 8: pad bytes must not leak
    for ((w, h) <- Seq((2, 2), (8, 6), (3, 5))) {
      val v = vid(w, h, n = 2)
      val back = Avi.decode(Avi.encode(v)).get
      assert(back.width == w && back.height == h)
      assert(back.microsPerFrame == v.microsPerFrame)
      assert(back.nFrames == 2)
      (0 until 2).foreach(f =>
        assert(back.frames(f).toSeq == v.frames(f).toSeq, s"frame $f"))
    }
  }

  test("hand-built 2x2 single-frame file decodes to known pixels") {
    // frame (top-down RGB): (0,0)=(1,2,3) (1,0)=(4,5,6)
    //                       (0,1)=(7,8,9) (1,1)=(10,11,12)
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val v = Avi.Video(2, 2, 33333, Vector(rgb))
    val bytes = Avi.encode(v)
    // on disk the frame chunk must be bottom-up BGR with 2-byte pad:
    // row y=1 first: (7,8,9)->(9,8,7), (10,11,12)->(12,11,10), pad 0 0
    val moviAt = {
      val s = new String(bytes, "ISO-8859-1"); s.indexOf("movi")
    }
    val frameData = bytes.slice(moviAt + 4 + 8, moviAt + 4 + 8 + 16)
    assert(frameData.toSeq == Seq[Byte](
      9, 8, 7, 12, 11, 10, 0, 0,
      3, 2, 1, 6, 5, 4, 0, 0))
    val back = Avi.decode(bytes).get
    assert(back.frames(0).toSeq == rgb.toSeq)
    assert(back.durationMicros == 33333L)
  }

  test("meanLuma matches a hand-computed value and reuses the Ppm kernel") {
    // all-gray frames: R=G=B=100 → luma = 100/255 for every frame
    val gray = Array.fill[Byte](4 * 3 * 3)(100.toByte)
    val v = Avi.Video(4, 3, 1000, Vector(gray, gray))
    assert(math.abs(Avi.meanLuma(v) - 100.0 / 255.0) < 1e-12)
    assert(Avi.meanLuma(v) == Ppm.meanLuma(v.frame(0)))
  }

  test("frameSample keeps every k-th frame and preserves duration") {
    val v = vid(n = 5, mpf = 10000)
    val s2 = Avi.frameSample(v, 2)
    assert(s2.nFrames == 3 && s2.microsPerFrame == 20000)
    assert(s2.frames(0).toSeq == v.frames(0).toSeq)
    assert(s2.frames(1).toSeq == v.frames(2).toSeq)
    assert(s2.frames(2).toSeq == v.frames(4).toSeq)
  }

  test("chunk walker skips junk/idx1; malformed payloads decode to None") {
    val bytes = Avi.encode(vid(n = 2))
    // append an idx1 chunk (decoder must ignore trailing index)
    val idx1 = Array[Byte]('i', 'd', 'x', '1', 4, 0, 0, 0, 1, 2, 3, 4)
    assert(Avi.decode(bytes ++ idx1).map(_.nFrames).contains(2))
    // truncated mid-frame → None
    assert(Avi.decode(bytes.dropRight(10)).isEmpty)
    // not RIFF / not AVI → None
    assert(Avi.decode("plainly not a video".getBytes).isEmpty)
    val notAvi = bytes.clone(); notAvi(8) = 'W'
    assert(Avi.decode(notAvi).isEmpty)
    // compressed (biCompression != 0) → None: flip strf compression
    val s = new String(bytes, "ISO-8859-1")
    val strfAt = s.indexOf("strf")
    val compressed = bytes.clone()
    compressed(strfAt + 8 + 16) = 1 // biCompression = 1
    assert(Avi.decode(compressed).isEmpty)
  }

  test("featurize routes AVI through the real video path") {
    import spark.implicits._
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(8)
    val media = MultiModal.packAvi(docs, w = 8, h = 6, n = 4)
    val feats = MultiModal.featurize(media).collect()
    assert(feats.length == 8)
    feats.foreach { f =>
      assert(f.n_frames == 4, "real frame count, not the stub byte-math")
      assert(f.brightness > 0.0 && f.brightness < 1.0)
      // thumb is a VALID half-frame-rate AVI
      val thumb = Avi.decode(f.thumb).get
      assert(thumb.nFrames == 2 && thumb.width == 8 && thumb.height == 6)
    }
    // cross-check one payload against a driver-side decode
    val one = media.filter(_.doc_id == feats.head.doc_id).head()
    val v = Avi.decode(one.content).get
    assert(math.abs(Avi.meanLuma(v) - feats.head.brightness) < 1e-12)
  }
}
