package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.core.Tables

class MultimodalSpec extends SparkTestBase {

  private lazy val docs = Tables(spark, sf0001, "documents")

  test("pack produces opaque blob + typed metadata, byte-exact") {
    val packed = Multimodal.pack(docs).cache()
    assert(packed.schema("blob").dataType.typeName == "binary")
    val r = packed.select(col("doc_id"), col("meta.n_bytes"),
      length(col("blob"))).collect()
    assert(r.nonEmpty && r.forall(row => row.getInt(1) == row.getInt(2)))
    packed.unpersist()
  }

  test("feature extraction is deterministic, fixed-dim, and batch-safe") {
    val packed = Multimodal.pack(docs)
    val f1 = Multimodal.extractFeatures(packed).orderBy("doc_id").collect()
    val f2 = Multimodal.extractFeatures(packed.repartition(7))
      .orderBy("doc_id").collect()
    assert(f1.length == docs.count())
    assert(f1.forall(_.getSeq[Float](1).length == Multimodal.featureDim))
    // repartitioning must not change any feature value (decoder is per-row)
    assert(f1.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq ==
      f2.map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq)
  }

  test("WAV codec: encode→decode round-trips header fields and PCM peak") {
    val samples = Array[Short](1000, -2000, 3000, -3000, 500, 0)
    val wav = MediaCodecs.encodeWavPcm16(44100, 2, samples)
    assert(MediaCodecs.sniffMime(wav) == "audio/wav")
    val info = MediaCodecs.decodeWav(wav).get
    assert(info.sampleRate == 44100)
    assert(info.channels == 2)
    assert(info.bitsPerSample == 16)
    assert(info.nFrames == 3) // 6 samples / 2 channels
    assert(info.peakAbs == 3000)
  }

  test("WAV decode walks chunks: LIST chunk before fmt is handled") {
    // RIFF spec allows metadata chunks before fmt — splice one in.
    val base = MediaCodecs.encodeWavPcm16(8000, 1, Array[Short](7, -9))
    val list = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = base.take(12) ++ list ++ base.drop(12)
    // fix RIFF size (bytes 4-7, LE) to cover the extra 12 bytes
    val sz = java.nio.ByteBuffer.wrap(spliced, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    sz.putInt(spliced.length - 8)
    val info = MediaCodecs.decodeWav(spliced).get
    assert(info.sampleRate == 8000 && info.channels == 1 &&
      info.nFrames == 2 && info.peakAbs == 9)
  }

  test("BMP codec: encode→decode round-trips dimensions incl. row padding") {
    // width 5 → rowBytes 15 → 1 pad byte per row: exercises the pad path
    val bmp = MediaCodecs.encodeBmp24(5, 3, (x, y) => (x * 40 + y) << 16)
    assert(MediaCodecs.sniffMime(bmp) == "image/bmp")
    val info = MediaCodecs.decodeBmp(bmp).get
    assert(info.width == 5 && info.height == 3 && info.bitsPerPixel == 24)
    assert(bmp.length == 54 + (15 + 1) * 3)
  }

  test("non-media bytes sniff as octet-stream and decode to None") {
    val junk = "definitely not media".getBytes
    assert(MediaCodecs.sniffMime(junk) == "application/octet-stream")
    assert(MediaCodecs.decodeWav(junk).isEmpty)
    assert(MediaCodecs.decodeBmp(junk).isEmpty)
  }

  test("decoders never throw on fuzzed or truncated blobs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // arbitrary bytes, plus adversarial variants that keep valid magics
    // but corrupt everything after (declared chunk sizes overrunning the
    // buffer, truncated fmt chunks, negative sizes)
    val wav = MediaCodecs.encodeWavPcm16(8000, 1, Array[Short](1, -2, 3))
    val genBlob: Gen[Array[Byte]] = Gen.oneOf(
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue)),
      // valid prefix, truncated anywhere
      Gen.choose(0, wav.length).map(wav.take),
      // valid magic + random tail
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => wav.take(12) ++ tail),
      Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(tail => "BM".getBytes ++ tail))
    val prop = Prop.forAll(genBlob) { blob =>
      MediaCodecs.sniffMime(blob) // must not throw
      MediaCodecs.decodeWav(blob) // None or value, never an exception
      MediaCodecs.decodeBmp(blob)
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("synthesizeMedia→probeMedia matches the arithmetic contract") {
    val probed = Multimodal.probeMedia(Multimodal.synthesizeMedia(docs))
      .orderBy("doc_id").collect()
    assert(probed.length == docs.count())
    probed.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getString(1) == "audio/wav", s"doc $id mime")
        assert(r.getInt(2) == 8000 + (id % 5) * 1000, s"doc $id rate")
        assert(r.getInt(3) == 1 + (id / 2) % 2, s"doc $id channels")
        assert(r.getLong(4) == 16 + id % 32, s"doc $id frames")
        assert(r.getInt(5) == (id % 100) * 300 + 100, s"doc $id peak")
        assert(r.isNullAt(6) && r.isNullAt(7))
      } else {
        assert(r.getString(1) == "image/bmp", s"doc $id mime")
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
        assert(r.getInt(6) == 4 + id % 16, s"doc $id width")
        assert(r.getInt(7) == 2 + id % 8, s"doc $id height")
      }
    }
  }

  test("corruptMedia routes exactly the injected failure classes to None") {
    val probed = Multimodal.probeMedia(
      Multimodal.corruptMedia(Multimodal.synthesizeMedia(docs))).collect()
    assert(probed.nonEmpty)
    probed.foreach { r =>
      val id = r.getLong(0)
      id % 7 match {
        case 0 | 1 => // sniff-level damage: container unrecognizable
          assert(r.getString(1) == "application/octet-stream", s"doc $id mime")
        case 2 => // magic intact, header torn: mime sniffs, fields are null
          assert(r.getString(1) == (if (id % 2 == 0) "audio/wav" else "image/bmp"))
          assert(r.isNullAt(2) && r.isNullAt(6), s"doc $id must not decode")
        case _ => // untouched blobs decode fully
          if (id % 2 == 0) assert(r.getInt(2) == 8000 + (id % 5) * 1000)
          else assert(r.getInt(6) == 4 + id % 16)
      }
    }
  }

  test("metadata-only reads do not require decoding the blob") {
    val meta = Multimodal.pack(docs).select("doc_id", "meta.mime", "meta.lang")
    assert(meta.distinct().count() >= 5) // one row per (doc, mime, lang) combo
    assert(!meta.columns.contains("blob"))
  }
  test("BMP gray decode returns the exact pixel function, top-down row-major") {
    // encode with a known asymmetric function (exercises bottom-up
    // storage + row padding: w=5 gives 15-byte rows padded to 16)
    val (w, h) = (5, 3)
    val blob = MediaCodecs.encodeBmp24(w, h,
      (x, y) => { val g = (x * 40 + y * 7) % 256; (g << 16) | (g << 8) | g })
    val Some((dw, dh, gray)) = MediaCodecs.decodeBmpGray(blob)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(gray(y * w + x) == (x * 40 + y * 7) % 256,
        s"pixel ($x,$y): got ${gray(y * w + x)}")
    // malformed: truncated pixel array must decode to None, not throw
    assert(MediaCodecs.decodeBmpGray(blob.take(60)).isEmpty)
  }

  test("decodeWavPcm round-trips the exact interleaved sample array") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7, -1)
    val blob = MediaCodecs.encodeWavPcm16(8000, 1, samples)
    val Some((info, got)) = MediaCodecs.decodeWavPcm(blob)
    assert(info.sampleRate == 8000 && info.channels == 1)
    assert(got.toSeq == samples.toSeq)
    // torn payload: decode clamps, never throws
    val torn = java.util.Arrays.copyOf(blob, blob.length - 3)
    assert(MediaCodecs.decodeWavPcm(torn).forall(_._2.length < samples.length))
  }

  test("audioFingerprint matches a driver-side recomputation of the bits") {
    val media = Multimodal.synthesizeAudioFp(docs)
    val sigs = Multimodal.audioFingerprint(media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.nonEmpty)
    // recompute from the synthesis formula for every doc — any codec or
    // chunking slip shows up as a mismatched signature
    sigs.foreach { case (id, sig) =>
      val n = (96 + (id % 16) * 8).toInt
      val a = Array.tabulate(n)(i => math.abs((((i * 37 + (id % 251) * 101) % 512) - 256).toLong))
      val total = a.sum
      var want = 0L
      for (k <- 0 until 64) {
        val idx = (0 until n).filter(i => (i.toLong * 64) / n == k)
        val csum = idx.map(a).sum
        if (csum * n > total * idx.length) want |= (1L << k)
      }
      assert(sig == want, s"doc $id")
    }
  }

  test("imagePhash: identical images share a signature, WAVs drop out") {
    val docs = spark.range(0, 600).toDF("doc_id")
    val sigs = Multimodal.imagePhash(Multimodal.synthesizeMedia(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only odd ids are BMPs
    assert(sigs.keySet.forall(_ % 2 == 1) && sigs.size == 300)
    // the synthesis arithmetic repeats mod 256: id and id+512 (both odd)
    // are byte-identical images, so the REAL decode must hash them equal
    for (id <- Seq(1L, 33L, 87L)) {
      assert(sigs(id) == sigs(id + 512), s"id $id vs ${id + 512}")
    }
    // signatures are not degenerate: more than one distinct value
    assert(sigs.values.toSet.size > 10)
  }
}
