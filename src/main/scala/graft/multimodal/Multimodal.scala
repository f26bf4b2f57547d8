package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder brief): image/audio/video as
  * opaque `binary` columns with typed metadata, processed in batches via
  * mapPartitions. The real decoder libraries are not in this container,
  * so `fakeDecode` is a clearly-marked deterministic stand-in — the
  * Spark-side contract (schema, batch shape, partitioning) is real and
  * oracle/spec-tested.
  *
  * Scale notes: blobs never pass through a shuffle wider than their
  * partition (mapPartitions, no groupBy on blob); metadata travels in a
  * separate struct column so pruning drops the heavy bytes when only
  * metadata is read.
  */
object Multimodal {

  val featureDim = 8

  /** Pack a text table into (id, blob, meta) — the landing shape for any
    * media type; mime is carried in metadata, bytes are opaque. */
  def pack(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      struct(
        lit("text/plain").as("mime"),
        length(col("text").cast("binary")).as("n_bytes"),
        col("lang").as("lang")).as("meta"))

  /** STUB decoder — deterministic fake in place of an image/audio codec:
    * "features" are per-stride byte averages. A real deployment swaps
    * this body for the codec call; everything around it stays. */
  private def fakeDecode(blob: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (blob == null || blob.isEmpty) return out
    val stride = math.max(1, blob.length / featureDim)
    var i = 0
    while (i < featureDim) {
      var sum = 0L; var n = 0
      var j = i * stride
      val end = math.min(blob.length, (i + 1) * stride)
      while (j < end) { sum += (blob(j) & 0xff); n += 1; j += 1 }
      out(i) = if (n == 0) 0f else sum.toFloat / n
      i += 1
    }
    out
  }

  /** Video-style frame sampling, fully declarative: the blob is treated
    * as fixed-size frames and every `every`-th frame is kept —
    * `sequence(0, n-1, step)` + `substring` on the binary column, no UDF,
    * whole-stage codegen. The blob never crosses a shuffle: explode and
    * slice are narrow, so at 100 TB each executor samples only its own
    * partitions' bytes. */
  def frameSample(packed: DataFrame, frameSize: Int, every: Int): DataFrame =
    packed
      .withColumn("n_frames",
        ceil(col("meta.n_bytes").cast("double") / frameSize).cast("int"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr(s"substring(blob, frame_idx * $frameSize + 1, $frameSize)").as("frame"))

  // ---- real-format decode branch (WAV/BMP, see MediaCodecs) --------------

  private val mediaBlobSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("blob", BinaryType)))

  /** Deterministic media synthesis: even doc_ids become real PCM16 WAV
    * files, odd doc_ids become real 24bpp BMPs, with header parameters
    * derived arithmetically from doc_id — so an external oracle can
    * predict every decoded field without parsing bytes itself. */
  def synthesizeMedia(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaBlobSchema)
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val blob =
          if (id % 2 == 0) {
            val sampleRate = (8000 + (id % 5) * 1000).toInt
            val channels = (1 + (id / 2) % 2).toInt
            val nFrames = (16 + id % 32).toInt
            val amp = ((id % 100) * 300 + 100).toShort
            val samples = new Array[Short](nFrames * channels)
            var i = 0
            while (i < samples.length) {
              // square wave: alternate +amp/-amp per frame, all channels
              samples(i) = if ((i / channels) % 2 == 0) amp
                           else (-amp).toShort
              i += 1
            }
            MediaCodecs.encodeWavPcm16(sampleRate, channels, samples)
          } else {
            val w = (4 + id % 16).toInt
            val h = (2 + id % 8).toInt
            MediaCodecs.encodeBmp24(w, h,
              (x, y) => { val g = ((x * 31 + y * 17 + id) % 256).toInt
                (g << 16) | (g << 8) | g })
          }
        Row(id, blob)
      }
    }(enc)
  }

  /** Deterministic corruption of a blob subset — the failure injector for
    * the quarantine gate (mirrors what 100 TB of scraped media actually
    * contains: truncated downloads and wrong-magic bytes).
    *   doc_id % 7 == 0 → truncated to 10 bytes (below the sniff minimum)
    *   doc_id % 7 == 1 → first magic byte zeroed (container unrecognizable)
    *   doc_id % 7 == 2 → truncated to 30 bytes (magic intact, header torn)
    * Everything else passes through untouched. Same mapPartitions batch
    * shape as the codecs — blobs never cross a shuffle. */
  def corruptMedia(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaBlobSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val blob = r.get(1).asInstanceOf[Array[Byte]]
        val out = (id % 7) match {
          case 0 => java.util.Arrays.copyOf(blob, math.min(10, blob.length))
          case 1 => val b = blob.clone(); if (b.length > 0) b(0) = 0; b
          case 2 => java.util.Arrays.copyOf(blob, math.min(30, blob.length))
          case _ => blob
        }
        Row(id, out)
      }
    }(enc)
  }

  private val mediaProbeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("peak_abs", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Decode media headers with the REAL parsers: mime is sniffed from
    * magic bytes, WAV fields walk RIFF chunks, BMP fields read the
    * BITMAPINFOHEADER, and peak_abs is a genuine sample-level pass over
    * the PCM payload. Same mapPartitions batch shape as extractFeatures —
    * blobs never cross a shuffle. */
  def probeMedia(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaProbeSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        // positional access: upstream mapPartitions rows carry no schema
        val blob = r.get(1).asInstanceOf[Array[Byte]]
        MediaCodecs.sniffMime(blob) match {
          case m @ "audio/wav" =>
            MediaCodecs.decodeWav(blob) match {
              case Some(w) => Row(id, m, w.sampleRate, w.channels,
                w.nFrames, w.peakAbs, null, null)
              case None => Row(id, m, null, null, null, null, null, null)
            }
          case m @ "image/bmp" =>
            MediaCodecs.decodeBmp(blob) match {
              case Some(b) => Row(id, m, null, null, null, null,
                b.width, b.height)
              case None => Row(id, m, null, null, null, null, null, null)
            }
          case m => Row(id, m, null, null, null, null, null, null)
        }
      }
    }(enc)
  }

  private val phashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  /** 64-bit average-hash of each decodable BMP: bit k compares the gray
    * at the (k%8, k/8) cell of an 8x8 sample grid against the image mean,
    * INTEGER-cross-multiplied (gray*npx > sum) so the threshold is exact.
    * One decode per blob inside mapPartitions — pixels never leave the
    * partition; only the 8-byte signature travels. Non-BMP rows drop. */
  def imagePhash(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = r.get(1).asInstanceOf[Array[Byte]]
        MediaCodecs.decodeBmpGray(blob).map { case (w, h, gray) =>
          val npx = (w * h).toLong
          var sum = 0L
          var i = 0
          while (i < gray.length) { sum += gray(i); i += 1 }
          var sig = 0L
          var k = 0
          while (k < 64) {
            val x = (k % 8) * w / 8
            val y = (k / 8) * h / 8
            if (gray(y * w + x) * npx > sum) sig |= (1L << k)
            k += 1
          }
          Row(id, sig)
        }
      }
    }(enc)
  }

  /** Synthesize the audio-fingerprint corpus: one mono PCM16 WAV per even
    * doc_id, samples from pure integer arithmetic so the DuckDB oracle can
    * predict every fingerprint bit analytically (the mm_image_phash
    * pattern for audio):
    *   n   = 96 + (id % 16) * 8        (96..216 frames)
    *   s_i = ((i*37 + (id % 251)*101) % 512) - 256
    * The (id%251, id%16) joint class space (~4000 classes) is larger than
    * the corpus at test scale, so exact-dup classes stay small and the
    * near-dup join output is non-degenerate without exploding. */
  def synthesizeAudioFp(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaBlobSchema)
    docs.select(col("doc_id")).filter(col("doc_id") % 2 === 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = (96 + (id % 16) * 8).toInt
          val samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = (((i * 37 + (id % 251) * 101) % 512) - 256).toShort
            i += 1
          }
          Row(id, MediaCodecs.encodeWavPcm16(8000, 1, samples))
        }
      }(enc)
  }

  /** 64-bit energy fingerprint of each decodable PCM16 WAV: samples split
    * into 64 index-proportional chunks (chunk k = samples with
    * i*64/n == k); bit k compares the chunk's MEAN |sample| against the
    * global mean, integer-cross-multiplied (chunkAbsSum * n >
    * totalAbsSum * chunkLen) so the threshold is exact. One REAL decode
    * per blob inside mapPartitions — PCM never leaves the partition; only
    * the 8-byte signature travels. Non-WAV rows drop. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(phashSchema)
    media.select(col("doc_id"), col("blob")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val blob = r.get(1).asInstanceOf[Array[Byte]]
        MediaCodecs.decodeWavPcm(blob).map { case (_, samples) =>
          val n = samples.length
          val chunkSum = new Array[Long](64)
          val chunkLen = new Array[Long](64)
          var total = 0L
          var i = 0
          while (i < n) {
            val k = ((i.toLong * 64) / n).toInt
            val a = math.abs(samples(i).toLong)
            chunkSum(k) += a
            chunkLen(k) += 1
            total += a
            i += 1
          }
          var sig = 0L
          var k = 0
          while (k < 64) {
            if (chunkSum(k) * n > total * chunkLen(k)) sig |= (1L << k)
            k += 1
          }
          Row(id, sig)
        }
      }
    }(enc)
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    StructField("n_bytes", IntegerType)))

  /** Batched feature extraction: one decoder invocation per row, batched
    * per partition (the mapInPandas batch shape, Scala-side). */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    packed.select(col("doc_id"), col("blob"))
      .mapPartitions { rows =>
        rows.map { r =>
          val blob = r.getAs[Array[Byte]]("blob")
          Row(r.getAs[Long]("doc_id"), fakeDecode(blob).toSeq,
            if (blob == null) 0 else blob.length)
        }
      }(enc)
  }
}
