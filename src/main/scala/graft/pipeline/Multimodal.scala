package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 P11): image/audio/video as
  * opaque `binary` columns with typed metadata, processed per-partition
  * in batches.
  *
  * The decoders are REAL parsers of standard uncompressed formats that
  * need no native codecs: PPM P6 images (netpbm), WAV/RIFF PCM audio,
  * and Y4M (YUV4MPEG2) video streams. The media SYNTHESIZER
  * ([[mediaTable]]) stands in for a production file reader (the actual
  * tar-shard reader exists since r13: [[graft.sources.Shards]]) —
  * it derives deterministic media bytes from `documents.text` so the
  * pipeline runs on the driver's test tables — but everything from the
  * binary column onward is the real operator: format sniffing, header
  * parsing, frame extraction, `mapPartitions` batching (one decoder
  * init per partition, the shape a JNI/FFI codec needs), narrow
  * no-shuffle execution. Swapping in libjpeg/ffmpeg means replacing
  * ONLY the three parse functions.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, mime: String, media: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, mime: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int,
      sample_rate: Int, n_samples: Long)
  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  // ------------------------------------------------------- synthesis
  /** Deterministic seed from the text — the same ANSI-safe mod-2^32
    * rolling hash as [[TextAnalysis]]'s fingerprint `(h·31 + code) mod
    * 2^32`, chosen so the seed (and every metadata field derived from
    * it below) is reproducible by ANY engine: the driver's DuckDB
    * oracle recomputes the expected width/height/frame counts from
    * `documents.text` arithmetically and checks them against what the
    * Spark side gets by synthesizing REAL bytes and parsing them back.
    * (A 64-bit wrapping fold would be unreachable from plain SQL.) */
  private[graft] def textSeed(text: String): Long = {
    // Fold Unicode CODE POINTS, not UTF-16 code units: the DuckDB
    // oracle folds `unicode(ch)` over per-code-point splits, so a
    // charAt loop would diverge on any non-BMP character (r6 advice).
    var h = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      h = (h * 31 + cp) % 4294967296L
      i += Character.charCount(cp)
    }
    h
  }

  private def lcgBytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 56).toByte
      i += 1
    }
    out
  }

  /** A real P6 PPM: "P6\n<w> <h>\n255\n" + w·h·3 RGB bytes. */
  private[graft] def synthPpm(seed: Long): Array[Byte] = {
    val w = 4 + math.floorMod(seed, 29).toInt
    val h = 4 + math.floorMod(seed >> 16, 29).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ lcgBytes(seed, w * h * 3)
  }

  /** A real RIFF/WAVE file: 44-byte canonical header + 16-bit mono PCM. */
  private[graft] def synthWav(seed: Long): Array[Byte] = {
    val sampleRate = 8000
    val nSamples = 64 + math.floorMod(seed, 4096).toInt
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(lcgBytes(seed, dataLen))
    bb.array()
  }

  /** A real YUV4MPEG2 stream: stream header + FRAME-delimited 4:2:0
    * planes (8×8 → 96 bytes per frame). The frame count reads a DIGIT
    * slice of the 32-bit seed disjoint from the PPM dims' (div 2^8 vs
    * mod 29 / div 2^16) — seed >> 32 would be constant 0 now that the
    * seed is mod-2^32 for oracle reproducibility. */
  private[graft] def synthY4m(seed: Long): Array[Byte] = {
    val (w, h) = (8, 8)
    val frames = 1 + math.floorMod(seed >> 8, 120).toInt
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1\n".getBytes("US-ASCII")
    val frameSize = w * h * 3 / 2
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames * (6 + frameSize))
    out.write(header)
    var f = 0
    while (f < frames) {
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(lcgBytes(seed + f, frameSize))
      f += 1
    }
    out.toByteArray
  }

  /** Build a binary media table. In production this is the parquet/
    * Lance/tar-shard reader; here the bytes are synthesized (real PPM/
    * WAV/Y4M payloads) so the pipeline runs on the test tables. */
  def mediaTable(docs: DataFrame): DataFrame = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val seed = textSeed(text)
        math.floorMod(id, 3) match {
          case 0 => MediaRecord(id, "image/x-portable-pixmap", synthPpm(seed))
          case 1 => MediaRecord(id, "audio/wav", synthWav(seed))
          case _ => MediaRecord(id, "video/x-yuv4mpeg", synthY4m(seed))
        }
      }).toDF()
  }

  // --------------------------------------------------------- decoders
  /** P6 PPM header parse → (width, height). */
  private[graft] def parsePpm(bytes: Array[Byte]): (Int, Int) = {
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6',
      "not a P6 PPM")
    // header = magic + 3 whitespace-separated ints (w, h, maxval)
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < bytes.length && Character.isWhitespace(bytes(i))) i += 1
      var x = 0
      while (i < bytes.length && !Character.isWhitespace(bytes(i))) {
        x = x * 10 + (bytes(i) - '0'); i += 1
      }
      vals(v) = x; v += 1
    }
    (vals(0), vals(1))
  }

  /** RIFF/WAVE chunk walk → (sampleRate, nSamples). */
  private[graft] def parseWav(bytes: Array[Byte]): (Int, Long) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE")
    var pos = 12
    var sampleRate = 0
    var channels = 1
    var bitsPerSample = 16
    var dataLen = 0L
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (id == "fmt ") {
        channels = bb.getShort(pos + 10)
        sampleRate = bb.getInt(pos + 12)
        bitsPerSample = bb.getShort(pos + 22)
      } else if (id == "data") dataLen = len.toLong
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    (sampleRate, dataLen / (channels * bitsPerSample / 8))
  }

  /** Byte offset of the PCM payload: the chunk walk [[parseWav]] runs,
    * stopped at the `data` chunk body. */
  private[graft] def wavDataOffset(bytes: Array[Byte]): Int = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val len = bb.getInt(pos + 4)
      if (id == "data") return pos + 8
      pos += 8 + len + (len & 1)
    }
    sys.error("RIFF/WAVE without a data chunk")
  }

  case class AudioFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Long, abs_sum: Long, zero_crossings: Long)

  /** Audio feature extraction (SURVEY.md §2 P11d; the audio leg of the
    * pixel pass [[resizeImages]]): total absolute amplitude and
    * zero-crossing count over the REAL decoded 16-bit PCM samples —
    * the loudness/zero-crossing-rate pair a speech-vs-music or
    * silence-trim filter reads. Integer outputs only: engine-exact, no
    * float summation order anywhere. Sign convention: a sample counts
    * as a crossing when the `s ≥ 0` predicate flips between
    * neighbors. Narrow per-partition map — one bounded feature row per
    * media row, no shuffle. */
  def audioFeatures(docs: DataFrame): DataFrame = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[AudioFeatures]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("audio/"))
      .mapPartitions(_.map { r =>
        val (rate, n) = parseWav(r.media)
        val off = wavDataOffset(r.media)
        var absSum = 0L
        var crossings = 0L
        var prevNonNeg = true
        var i = 0
        while (i < n) {
          val lo = java.lang.Byte.toUnsignedInt(r.media(off + 2 * i))
          val hi = r.media(off + 2 * i + 1).toInt // sign-carrying byte
          val s = (hi << 8) | lo
          absSum += math.abs(s)
          val nonNeg = s >= 0
          if (i > 0 && nonNeg != prevNonNeg) crossings += 1
          prevNonNeg = nonNeg
          i += 1
        }
        AudioFeatures(r.doc_id, rate, n, absSum, crossings)
      }).toDF()
  }

  case class AudioHash(doc_id: Long, ahash: Long)

  /** 64-bit loudness-envelope fingerprint per audio record (SURVEY.md
    * §2 P11i, r14) — the AUDIO leg of the near-dup family (text has
    * exact/minhash/simhash/semantic, images have [[imageAHash]]; this
    * completes the modality set): split the decoded 16-bit PCM stream
    * into 64 contiguous windows (sample j lands in window ⌊j·64/n⌋),
    * bit w set iff window w's MEAN |sample| exceeds the stream mean —
    * in exact all-integer form, windowAbsSum·n &gt; totalAbsSum·windowLen
    * (the [[ahashOfPixels]] above-mean idiom on the loudness envelope,
    * divisionless and engine-exact; the products fit a long up to the
    * guarded 2^24-sample bound — see [[envelopeHash]], which fails
    * loudly beyond it). A re-ingested copy hashes
    * identically; an amplitude-rescaled copy also does (the predicate
    * is scale-invariant), which is exactly the "same clip, different
    * gain" crawl case. One 8-byte hash per clip is all that ever
    * shuffles — samples never do. */
  def audioFingerprint(docs: DataFrame): DataFrame = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[AudioHash]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("audio/"))
      .mapPartitions(_.map { r =>
        AudioHash(r.doc_id, envelopeHash(r.media))
      }).toDF()
  }

  /** The fingerprint core over one WAV record's decoded samples.
    *
    * Sample bound (r15 advice): the divisionless above-mean compare
    * `wsum(w)·n > total·wlen(w)` is exact only while both products fit
    * a signed 64-bit — total ≤ 2^15·n, so n ≤ 2^24 (~6 min of 48 kHz
    * mono) keeps total·wlen ≤ 2^15·n·n/64 &lt; 2^63 with margin.
    * Beyond that the compare would silently wrap and emit WRONG
    * fingerprint bits; fail loudly instead (split longer streams
    * upstream, the tar-entry discipline). */
  private[graft] def envelopeHash(media: Array[Byte]): Long = {
    val (_, nL) = parseWav(media)
    require(nL <= (1L << 24),
      s"audio fingerprint: $nL samples exceeds the 2^24 exact-integer " +
        "bound (~6 min at 48 kHz mono) — the divisionless envelope " +
        "compare would overflow 64-bit and corrupt bits; segment the " +
        "stream upstream")
    val n = nL.toInt
    val off = wavDataOffset(media)
    val wsum = new Array[Long](64)
    val wlen = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < n) {
      val lo = java.lang.Byte.toUnsignedInt(media(off + 2 * i))
      val hi = media(off + 2 * i + 1).toInt // sign-carrying byte
      val a = math.abs((hi << 8) | lo).toLong
      val w = (i.toLong * 64 / n).toInt
      wsum(w) += a
      wlen(w) += 1
      total += a
      i += 1
    }
    var hash = 0L
    var w = 0
    while (w < 64) {
      if (wsum(w) * n > total * wlen(w)) hash |= (1L << w)
      w += 1
    }
    hash
  }

  /** Near-duplicate AUDIO pairs by envelope-fingerprint hamming ≤
    * `maxHamming` — the audio twin of [[imageHashPairs]], riding the
    * SAME distinct-value banding closure ([[hashPairs]]): recall 1 by
    * pigeonhole, flood-proof, candidates ∝ distinct fingerprints.
    * Returns (a, b, hamming), a &lt; b. */
  def audioHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hashPairs(audioFingerprint(docs).localCheckpoint(), maxHamming)

  /** Y4M stream header parse → (width, height, frameSize, frameOffsets). */
  private[graft] def parseY4m(bytes: Array[Byte]): (Int, Int, Seq[Int]) = {
    require(bytes.length > 10 &&
      new String(bytes, 0, 9, "US-ASCII") == "YUV4MPEG2", "not a Y4M stream")
    var nl = 9
    while (bytes(nl) != '\n') nl += 1
    val header = new String(bytes, 0, nl, "US-ASCII")
    val params = header.split(' ').drop(1)
    val w = params.find(_.startsWith("W")).map(_.tail.toInt)
      .getOrElse(sys.error("Y4M missing width"))
    val h = params.find(_.startsWith("H")).map(_.tail.toInt)
      .getOrElse(sys.error("Y4M missing height"))
    val frameSize = w * h * 3 / 2 // C420 (the default chroma mode)
    // frame records: "FRAME[params]\n" + frameSize bytes
    val offsets = Seq.newBuilder[Int]
    var pos = nl + 1
    while (pos < bytes.length) {
      var fnl = pos
      while (bytes(fnl) != '\n') fnl += 1 // skip FRAME param line
      offsets += fnl + 1
      pos = fnl + 1 + frameSize
    }
    (w, h, offsets.result())
  }

  case class FrameHash(doc_id: Long, frame_idx: Int, fhash: Long)

  /** Luma-plane aHash for one 4:2:0 frame: the [[ahashOfPixels]] rule
    * on the Y plane (one byte per pixel — no channel sum), tw×th
    * nearest-neighbor sampled, bit p set iff gray·(tw·th) &gt; Σ gray. */
  private[graft] def lumaHash(bytes: Array[Byte], off: Int, w: Int,
      h: Int, tw: Int = 8, th: Int = 8): Long = {
    val gray = new Array[Long](tw * th)
    var total = 0L
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        val g = java.lang.Byte.toUnsignedInt(bytes(off + sy * w + sx)).toLong
        gray(y * tw + x) = g
        total += g
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var p = 0
    while (p < tw * th) {
      if (gray(p) * (tw * th) > total) hash |= (1L << p)
      p += 1
    }
    hash
  }

  /** One 64-bit luma aHash per SAMPLED frame (every `stride`-th) —
    * the video near-dup unit (SURVEY.md §2 P11j): a video is its
    * sequence of frame fingerprints; 8 bytes per sampled frame is all
    * that ever shuffles, never planes. Narrow per-partition flatMap. */
  def videoFrameHashes(docs: DataFrame, stride: Int = 10): DataFrame = {
    require(stride > 0, "stride must be positive")
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[FrameHash]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("video/"))
      .mapPartitions(_.flatMap { r =>
        val (w, h, offs) = parseY4m(r.media)
        (0 until offs.length by stride).iterator.map { idx =>
          FrameHash(r.doc_id, idx, lumaHash(r.media, offs(idx), w, h))
        }
      }).toDF()
  }

  /** Near-duplicate VIDEO pairs (SURVEY.md §2 P11j, r14 — the fourth
    * and last near-dup modality): two videos pair when at least
    * `minMatches` of their SAME-POSITION sampled frames hash within
    * `maxHamming` — the re-encoded / re-crawled-clip case. Candidates
    * ride [[bandedHashValuePairs]] over DISTINCT frame-hash values
    * (flood-proof: a million copies of one test pattern are one
    * banding participant), constrained to equal frame positions on
    * expansion; per-pair evidence is then one count-aggregate.
    * Returns (a, b, n_matched), a &lt; b, n_matched ≥ minMatches. */
  def videoNearDupPairs(docs: DataFrame, stride: Int = 10,
      maxHamming: Int = 3, minMatches: Int = 1): DataFrame = {
    require(minMatches > 0, "minMatches must be positive")
    val frames = videoFrameHashes(docs, stride).localCheckpoint()
    val valuePairs = bandedHashValuePairs(
      frames.select(col("fhash").as("ahash")).distinct(), maxHamming)
    val fa = frames.select(col("fhash").as("ha"),
      col("doc_id").as("da"), col("frame_idx").as("fi"))
    val fb = frames.select(col("fhash").as("hb"),
      col("doc_id").as("db"), col("frame_idx").as("fj"))
    // cross: within-radius distinct values, same frame position (one
    // doc carries ONE hash per position, so da != db holds)
    val cross = valuePairs.join(fa, Seq("ha")).join(fb, Seq("hb"))
      .filter(col("fi") === col("fj"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"))
    // intra: identical frame hashes at the same position
    val intra = frames.as("x")
      .join(frames.as("y"),
        col("x.fhash") === col("y.fhash")
          && col("x.frame_idx") === col("y.frame_idx")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    cross.unionByName(intra)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatches)
  }

  /** Decode one record by sniffing its mime/magic — a REAL parse of the
    * standard format, not a fake. */
  private[graft] def decode(r: MediaRecord): MediaFeatures = r.mime match {
    case m if m.startsWith("image/") =>
      val (w, h) = parsePpm(r.media)
      MediaFeatures(r.doc_id, r.mime, r.media.length.toLong, w, h, 1, 0, 0L)
    case m if m.startsWith("audio/") =>
      val (rate, n) = parseWav(r.media)
      MediaFeatures(r.doc_id, r.mime, r.media.length.toLong, 0, 0, 0, rate, n)
    case m if m.startsWith("video/") =>
      val (w, h, offs) = parseY4m(r.media)
      MediaFeatures(r.doc_id, r.mime, r.media.length.toLong, w, h,
        offs.length, 0, 0L)
    case other => sys.error(s"unsupported media type: $other")
  }

  /** Per-partition batched decode: one iterator pass, decoder state
    * initialized once per partition (the stub-free parsers here are
    * stateless, but the batching shape is what an FFI codec needs). */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val featEnc = Encoders.product[MediaFeatures]
    media.as[MediaRecord].mapPartitions(_.map(decode))
  }

  /** End-to-end: documents → binary media table → decoded features. */
  def features(docs: DataFrame): DataFrame =
    decodeFeatures(mediaTable(docs)).toDF()

  /** Pixel-data offset of a P6 PPM: one whitespace byte follows the
    * maxval token, then raw RGB. */
  private[graft] def ppmPixelOffset(bytes: Array[Byte]): Int = {
    var i = 2
    var v = 0
    while (v < 3) {
      while (i < bytes.length && Character.isWhitespace(bytes(i))) i += 1
      while (i < bytes.length && !Character.isWhitespace(bytes(i))) i += 1
      v += 1
    }
    i + 1
  }

  case class ResizedImage(doc_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, out_len: Long, px_sum: Long,
      resized: Array[Byte])

  /** Image RESIZE + feature extraction (SURVEY.md §2 P11c): every
    * image downsampled to `tw`×`th` by nearest-neighbor (out pixel
    * (x,y) ← source pixel (⌊x·w/tw⌋, ⌊y·h/th⌋)) — REAL pixel
    * arithmetic on the decoded P6 bytes producing a REAL P6 output,
    * plus the summed-RGB feature of the resized image (the
    * normalization statistic a training dataloader wants per image).
    * Swap the body of the per-record function for an FFI codec
    * (libjpeg/ffmpeg) and nothing else changes — the Spark plumbing
    * (binary column in, narrow per-partition map, typed output
    * schema) is the production shape.
    *
    * Scale: narrow mapPartitions — no shuffle, each image row maps to
    * one fixed-size output row, so work scales with row count and
    * output bytes are BOUNDED (tw·th·3) regardless of source size:
    * exactly the property that lets the downstream training pipeline
    * repartition/pack the resized tensor column without moving
    * source-resolution payloads.
    *
    * Cross-engine: nearest-neighbor index math is integer-exact, and
    * the px_sum feature is an integer — the oracle replays the
    * synthesizer's LCG byte stream in 128-bit SQL arithmetic and
    * re-derives the same sum, making even the PIXEL CONTENT of this
    * pass cross-engine-verified (the resized bytes themselves are
    * byte-checked in MultimodalSpec). */
  def resizeImages(docs: DataFrame, tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0, "target dims must be positive")
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[ResizedImage]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("image/"))
      .mapPartitions(_.map { r =>
        val (w, h) = parsePpm(r.media)
        val off = ppmPixelOffset(r.media)
        val header = s"P6\n$tw $th\n255\n".getBytes("US-ASCII")
        val out = new Array[Byte](header.length + tw * th * 3)
        System.arraycopy(header, 0, out, 0, header.length)
        var sum = 0L
        var y = 0
        while (y < th) {
          val sy = y * h / th
          var x = 0
          while (x < tw) {
            val sx = x * w / tw
            val src = off + 3 * (sy * w + sx)
            val dst = header.length + 3 * (y * tw + x)
            var c = 0
            while (c < 3) {
              out(dst + c) = r.media(src + c)
              sum += java.lang.Byte.toUnsignedInt(r.media(src + c))
              c += 1
            }
            x += 1
          }
          y += 1
        }
        ResizedImage(r.doc_id, w, h, tw, th, out.length.toLong, sum, out)
      }).toDF()
  }

  /** Frame sampling for video media: every `stride`-th frame, with the
    * REAL frame payload sliced out of the Y4M stream (w·h·3/2 bytes of
    * 4:2:0 planes). Narrow per-partition flatMap — each media row fans
    * out to its sampled frames with no shuffle, so frame work scales
    * with output frames, not input bytes moved (the shape a 100 TB
    * video pipeline needs). */
  def sampleFrames(docs: DataFrame, stride: Int = 10): DataFrame = {
    require(stride > 0, "stride must be positive")
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val frameEnc = Encoders.product[Frame]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("video/"))
      .mapPartitions(_.flatMap { r =>
        val (w, h, offs) = parseY4m(r.media)
        val frameSize = w * h * 3 / 2
        (0 until offs.length by stride).iterator.map { idx =>
          Frame(r.doc_id, idx,
            java.util.Arrays.copyOfRange(r.media, offs(idx), offs(idx) + frameSize))
        }
      }).toDF()
  }

  case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual average-hash (aHash) per image (SURVEY.md §2 P11e) —
    * the image leg of the near-dup family: resize to `tw`×`th` by the
    * SAME nearest-neighbor index math as [[resizeImages]], gray each
    * output pixel as r+g+b, set bit p = y·tw+x iff gray_p·(tw·th) >
    * Σ gray (strictly — the all-integer form of "above the mean", no
    * division, engine-exact). Images that survive recompression or
    * mild tone shifts keep most bits; unrelated images agree on ~half.
    * Narrow per-partition map, one 8-byte hash per image — at 100 TB
    * the hash table is the only thing that ever shuffles, never
    * pixels. */
  private[graft] def ahashOf(media: Array[Byte], tw: Int, th: Int): Long = {
    val (w, h) = parsePpm(media)
    ahashOfPixels(media, ppmPixelOffset(media), w, h, tw, th)
  }

  /** The aHash core over a raw RGB8 pixel buffer starting at `off` —
    * shared by the PPM path ([[ahashOf]]) and the decoded-PNG path
    * ([[pngAHashes]]), so both formats hash the SAME pixel stream to
    * the SAME bits (the cross-format property the shards keep oracle
    * proves). */
  private[graft] def ahashOfPixels(px: Array[Byte], off: Int, w: Int,
      h: Int, tw: Int, th: Int): Long = {
    val gray = new Array[Long](tw * th)
    var total = 0L
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        val src = off + 3 * (sy * w + sx)
        var g = 0L
        var c = 0
        while (c < 3) {
          g += java.lang.Byte.toUnsignedInt(px(src + c))
          c += 1
        }
        gray(y * tw + x) = g
        total += g
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var p = 0
    while (p < tw * th) {
      if (gray(p) * (tw * th) > total) hash |= (1L << p)
      p += 1
    }
    hash
  }

  case class DecodedHash(doc_id: Long, crc_ok: Boolean,
      error: Option[String], ahash: Option[Long])

  /** PNG decode → aHash over arbitrary (doc_id, bytes) records — the
    * read side of the WebDataset dedup loop (shards → decode → hash):
    * unlike [[imageAHash]], the input is whatever bytes the storage
    * layer returned, so every record passes through the REAL decode
    * (CRC walk, inflate, unfilter) and a failing one is QUARANTINED
    * (crc_ok=false + error, hash NULL — never dropped). Narrow
    * per-partition map; one 8-byte hash per image is all that ever
    * shuffles. */
  def pngAHashes(records: DataFrame, tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0 && tw * th <= 64,
      "tw*th must fit a 64-bit hash")
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    implicit val outEnc = Encoders.product[DecodedHash]
    records.select(col("doc_id").cast("long"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parsePng(bytes) match {
          case Left(err) => DecodedHash(id, crc_ok = false, Some(err), None)
          case Right(img) => DecodedHash(id, crc_ok = true, None,
            Some(ahashOfPixels(img.px, 0, img.w, img.h, tw, th)))
        }
      }).toDF()
  }

  def imageAHash(docs: DataFrame, tw: Int = 8, th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0 && tw * th <= 64,
      "tw*th must fit a 64-bit hash")
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[ImageHash]
    mediaTable(docs).as[MediaRecord]
      .filter((r: MediaRecord) => r.mime.startsWith("image/"))
      .mapPartitions(_.map(r => ImageHash(r.doc_id, ahashOf(r.media, tw, th))))
      .toDF()
  }

  // -------------------------------------------------------------- PNG
  // The one COMPRESSED image format a pure-JVM decode can meet
  // honestly: zlib is java.util.zip, CRC32 is java.util.zip, and the
  // PNG scanline filters are integer arithmetic. This is the format
  // public ingest actually encounters (PPM is the uncompressed
  // teaching case); the synthesizer emits REAL spec-conformant PNGs
  // (signature, IHDR/IDAT/IEND, per-chunk CRC32, deflated filtered
  // scanlines) and the decoder is a REAL decoder: chunk walk with CRC
  // verification, inflate, all five standard unfilters (None/Sub/Up/
  // Average/Paeth — the synthesizer only writes filter 0, the spec
  // exercises 1–4 on hand-built scanlines).

  /** One PNG chunk: 4-byte BE length + type + body + CRC32(type+body). */
  private def pngChunk(typ: String, body: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(t); crc.update(body)
    java.nio.ByteBuffer.allocate(12 + body.length)
      .putInt(body.length).put(t).put(body).putInt(crc.getValue.toInt)
      .array()
  }

  /** A real RGB8 PNG with the SAME dims and LCG pixel stream as
    * [[synthPpm]] — the DuckDB oracle replays one byte stream for
    * both formats; what differs is everything the decoder must undo
    * (deflate, filters, CRCs). */
  private[graft] def synthPng(seed: Long): Array[Byte] = {
    val w = 4 + math.floorMod(seed, 29).toInt
    val h = 4 + math.floorMod(seed >> 16, 29).toInt
    val px = lcgBytes(seed, w * h * 3)
    val stride = 1 + w * 3
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      raw(y * stride) = 0 // filter type None per scanline
      System.arraycopy(px, y * w * 3, raw, y * stride + 1, w * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte) // bit depth
      .put(2.toByte) // color type: truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      .array()
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", out.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Decoded RGB8 image: dims + the unfiltered pixel bytes. */
  private[graft] case class PngImage(w: Int, h: Int, px: Array[Byte])

  /** REAL PNG decode: signature check, chunk walk with per-chunk CRC32
    * verification (a mismatch returns Left — the caller QUARANTINES,
    * never silently drops), IHDR validation (8-bit RGB, no interlace —
    * the profile the synthesizer emits), multi-IDAT inflate, and the
    * five standard scanline unfilters. */
  private[graft] def parsePng(bytes: Array[Byte]): Either[String, PngImage] = {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')
    if (bytes.length < 8 || !java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(bytes, 0, 8), sig))
      return Left("bad PNG signature")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var pos = 8
    var w = 0; var h = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    while (pos + 12 <= bytes.length) {
      val len = bb.getInt(pos)
      if (len < 0 || pos + 12 + len > bytes.length)
        return Left("truncated chunk")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != bb.getInt(pos + 8 + len))
        return Left(s"CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          if (len < 13) return Left("short IHDR")
          seenIhdr = true
          w = bb.getInt(pos + 8); h = bb.getInt(pos + 12)
          val (depth, color, interlace) =
            (bytes(pos + 16), bytes(pos + 17), bytes(pos + 20))
          if (depth != 8 || color != 2 || interlace != 0)
            return Left(s"unsupported PNG profile depth=$depth color=$color")
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case _ => () // IEND / ancillary
      }
      pos += 12 + len
    }
    if (!seenIhdr) return Left("missing IHDR")
    val stride = 1 + w * 3
    val raw = new Array[Byte](h * stride)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inflater.finished())
        got += inflater.inflate(raw, got, raw.length - got)
    } catch {
      case e: java.util.zip.DataFormatException =>
        return Left(s"bad zlib stream: ${e.getMessage}")
    } finally inflater.end()
    if (got != raw.length) return Left("short pixel stream")
    // unfilter in place into the output (bpp = 3 for RGB8)
    val px = new Array[Byte](h * w * 3)
    val bpp = 3
    var y = 0
    while (y < h) {
      val f = raw(y * stride)
      var x = 0
      while (x < w * 3) {
        val cur = java.lang.Byte.toUnsignedInt(raw(y * stride + 1 + x))
        val left = if (x >= bpp)
          java.lang.Byte.toUnsignedInt(px(y * w * 3 + x - bpp)) else 0
        val up = if (y > 0)
          java.lang.Byte.toUnsignedInt(px((y - 1) * w * 3 + x)) else 0
        val ul = if (y > 0 && x >= bpp)
          java.lang.Byte.toUnsignedInt(px((y - 1) * w * 3 + x - bpp)) else 0
        val recon = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            cur + (if (pa <= pb && pa <= pc) left
                   else if (pb <= pc) up else ul)
          case other => return Left(s"unknown filter type $other")
        }
        px(y * w * 3 + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Right(PngImage(w, h, px))
  }

  /** Binary PNG table over the image rows (doc_id ≡ 0 mod 3 — the
    * [[mediaTable]] image assignment). Re-ingest corruption is planted
    * deterministically: every doc_id ≡ 0 mod 97 gets one IDAT byte
    * flipped AFTER the CRC was computed — the truncated-download /
    * bit-rot case a crawler meets, detectable exactly because PNG
    * carries per-chunk CRCs. */
  def pngTable(docs: DataFrame): DataFrame = {
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = synthPng(textSeed(text))
        if (id % 97 == 0) {
          // flip a byte inside the IDAT body (offset 8+25+8 = first
          // IDAT payload byte) — the chunk CRC no longer matches
          val idatBody = 8 + 25 + 8
          bytes(idatBody) = (bytes(idatBody) ^ 0xff).toByte
        }
        MediaRecord(id, "image/png", bytes)
      }).toDF()
  }

  case class PngFeatures(doc_id: Long, crc_ok: Boolean,
      error: Option[String], src_w: Option[Int], src_h: Option[Int],
      px_sum: Option[Long])

  /** PNG decode → nearest-neighbor resize features (SURVEY.md §2
    * P11f): the [[resizeImages]] pass on COMPRESSED input — full
    * decode (CRC walk, inflate, unfilter), then the same integer
    * nearest-neighbor sampling and summed-RGB feature over the tw×th
    * result. A record failing any decode step is QUARANTINED: emitted
    * with crc_ok=false and its error string, features NULL — dropping
    * it would silently shrink the corpus, and a quarantine table is
    * what the re-crawl queue reads. Narrow per-partition map, no
    * shuffle; one bounded row per image. */
  def pngResizedFeatures(docs: DataFrame, tw: Int = 8,
      th: Int = 8): DataFrame = {
    require(tw > 0 && th > 0, "target dims must be positive")
    implicit val recEnc = Encoders.product[MediaRecord]
    implicit val outEnc = Encoders.product[PngFeatures]
    pngTable(docs).as[MediaRecord]
      .mapPartitions(_.map { r =>
        parsePng(r.media) match {
          case Left(err) =>
            PngFeatures(r.doc_id, crc_ok = false, Some(err), None, None, None)
          case Right(img) =>
            var sum = 0L
            var y = 0
            while (y < th) {
              val sy = y * img.h / th
              var x = 0
              while (x < tw) {
                val sx = x * img.w / tw
                val src = 3 * (sy * img.w + sx)
                var c = 0
                while (c < 3) {
                  sum += java.lang.Byte.toUnsignedInt(img.px(src + c))
                  c += 1
                }
                x += 1
              }
              y += 1
            }
            PngFeatures(r.doc_id, crc_ok = true, None,
              Some(img.w), Some(img.h), Some(sum))
        }
      }).toDF()
  }

  /** Near-duplicate IMAGE pairs by aHash hamming distance ≤
    * `maxHamming` — [[imageAHash]] closed with the simhash banding
    * idiom: split the 64-bit hash into `maxHamming + 1` chunks; by
    * pigeonhole any pair within the radius agrees on at least one
    * whole chunk, so candidates come from equi-joins on (chunk_idx,
    * chunk_value) — recall 1 by construction, never an all-pairs
    * scan — then the exact `bit_count(xor)` filter runs only on
    * collisions (output-proportional, the [[Dedup.simhashPairs]]
    * discipline). Returns (a, b, hamming), a < b. */
  def imageHashPairs(docs: DataFrame, maxHamming: Int = 3,
      tw: Int = 8, th: Int = 8): DataFrame =
    hashPairs(imageAHash(docs, tw, th).localCheckpoint(), maxHamming)

  /** Banded candidate pairs over DISTINCT hash VALUES — the
    * flood-proof core (r14): a real crawl carries floods of
    * byte-identical images (blank thumbnails, error placeholders), and
    * banding over ROWS would put a million copies of one hash into the
    * same bucket — a quadratic candidate join from data the pipeline
    * already knows are duplicates. Banding over the distinct values
    * makes candidate work ∝ |distinct hashes| · chunks, independent of
    * flood size. Returns (ha, hb, hamming) with ha &lt; hb, hamming ≤
    * radius — recall 1 by the same pigeonhole (the argument is about
    * hash values, not rows). */
  /** The pigeonhole banding rows of a hash-VALUE frame: each 64-bit
    * `ahash` splits into `maxHamming + 1` disjoint chunks (any pair
    * within the radius agrees on at least one whole chunk), emitted as
    * (chunk_idx, chunk_val, ahash) — the shared candidate-key scheme
    * of [[bandedHashValuePairs]] (in-memory closure) and
    * [[MediaHashIndex]] (the r15 PERSISTENT form: this exact frame is
    * what the stored index keeps partitioned by chunk_idx, so a stored
    * probe and a fresh one bucket identically by construction). */
  private[graft] def hashChunks(hashVals: DataFrame,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "radius must be in [0,64)")
    val nChunks = maxHamming + 1
    val bits = 64 / nChunks
    hashVals.select(col("ahash"),
      explode(sequence(lit(0), lit(nChunks - 1))).as("chunk_idx"))
      .withColumn("chunk_val",
        // unsigned-shift the chunk into the low bits; the LAST chunk
        // keeps the 64 % nChunks remainder bits too (still disjoint)
        when(col("chunk_idx") === nChunks - 1,
          shiftrightunsigned(col("ahash"), (nChunks - 1) * bits))
          .otherwise(pmod(
            expr(s"shiftrightunsigned(ahash, chunk_idx * $bits)"),
            lit(1L << bits))))
  }

  private def bandedHashValuePairs(hashVals: DataFrame,
      maxHamming: Int): DataFrame = {
    val chunks = hashChunks(hashVals, maxHamming)
    val a = chunks.select(col("chunk_idx"), col("chunk_val"),
      col("ahash").as("ha"))
    val b = chunks.select(col("chunk_idx"), col("chunk_val"),
      col("ahash").as("hb"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("ha") < col("hb"))
      .select(col("ha"), col("hb"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** The banding closure over an ALREADY-HASHED (doc_id, ahash) frame
    * — factored out of [[imageHashPairs]] so the WebDataset read path
    * (shards → [[pngAHashes]]) rides the identical recall-1 candidate
    * join. Returns (a, b, hamming), a &lt; b — the COMPLETE
    * within-radius pair relation: candidates come from
    * [[bandedHashValuePairs]] over distinct hashes, then expand back
    * to member pairs, so every expanded row IS a true pair
    * (output-proportional by construction) and an identical-hash flood
    * never inflates the candidate join. Callers that only need the
    * KEEP decision should prefer [[hashDedupEdges]] — the complete
    * relation on a flood is inherently quadratic in the OUTPUT. */
  def hashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val members = hashes.select(col("doc_id"), col("ahash"))
    val valuePairs = bandedHashValuePairs(
      members.select(col("ahash")).distinct(), maxHamming)
    // cross-group: every member pair between two within-radius hash
    // groups (groups are disjoint, so least/greatest needs no dedup)
    val cross = valuePairs
      .join(members.select(col("ahash").as("ha"), col("doc_id").as("da")),
        Seq("ha"))
      .join(members.select(col("ahash").as("hb"), col("doc_id").as("db")),
        Seq("hb"))
      .select(least(col("da"), col("db")).as("a"),
        greatest(col("da"), col("db")).as("b"), col("hamming"))
    // intra-group: identical hashes are hamming-0 pairs
    val intra = members.as("x")
      .join(members.as("y"),
        col("x.ahash") === col("y.ahash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        lit(0L).as("hamming"))
    cross.unionByName(intra)
  }

  /** CC-EQUIVALENT edge set for the near-dup KEEP decision (r14): star
    * edges inside each identical-hash group (group-min → member) plus
    * ONE representative edge per within-radius hash-value pair —
    * LINEAR in flood size where [[hashPairs]]' complete relation is
    * quadratic (a 1M-copy placeholder flood is 10^6 star edges, not
    * 5·10^11 pairs), with identical connectivity and therefore the
    * identical [[graft.pipeline.Dedup.keepAfterNearDedup]] keep set.
    * Returns (a_id, b_id). */
  def hashDedupEdges(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val members = hashes.select(col("doc_id"), col("ahash"))
    val reps = members.groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("rep"))
    val star = members.join(reps, Seq("ahash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
    val repEdges = bandedHashValuePairs(reps.select(col("ahash")),
        maxHamming)
      .join(reps.select(col("ahash").as("ha"), col("rep").as("a_id")),
        Seq("ha"))
      .join(reps.select(col("ahash").as("hb"), col("rep").as("b_id")),
        Seq("hb"))
      .select(col("a_id"), col("b_id"))
    star.unionByName(repEdges)
  }

  /** CC-EQUIVALENT edge set for the VIDEO near-dup KEEP decision (r15,
    * the [[hashDedupEdges]] discipline lifted to per-frame hashes) —
    * LINEAR in flood size where [[videoNearDupPairs]]' complete pair
    * relation is quadratic: N re-crawled copies of one test-pattern
    * clip put N frames into each (frame_idx, fhash) group, and the
    * complete relation expands N²·frames rows before the CC even
    * starts; here they cost N·frames star edges.
    *
    * Construction: members are (doc_id, frame_idx, fhash) sampled-frame
    * rows. (1) STAR edges inside each identical (frame_idx, fhash)
    * group — group-min doc → member. (2) ONE representative edge per
    * within-radius frame-hash value pair PER shared frame position:
    * [[bandedHashValuePairs]] over the DISTINCT fhash values (recall 1
    * by pigeonhole), expanded against the per-(position, value)
    * representatives with the equal-position constraint — never
    * against members.
    *
    * Connectivity proof (minMatches = 1, the keep contract): a
    * complete-relation pair (x, y) means some position i has hashes
    * within radius. Equal hashes → x, y share the (i, h) group, both
    * star-linked to its rep. Different hashes ha ≠ hb → x ~ rep(i,ha),
    * y ~ rep(i,hb), and the rep edge (rep(i,ha), rep(i,hb)) exists
    * because (ha, hb) is a within-radius distinct-value pair.
    * Conversely every emitted edge IS a same-position within-radius
    * pair, so the transitive closures — and therefore the
    * [[graft.pipeline.Dedup.keepAfterNearDedup]] min-id keep set — are
    * identical. minMatches &gt; 1 changes the PAIR relation (evidence
    * counting) and must use [[videoNearDupPairs]]; this builder is the
    * decision path, where one shared frame links the component.
    *
    * Scale: one groupBy over frame rows (8 bytes of hash per sampled
    * frame — planes never shuffle), banding over distinct hash values,
    * rep joins at distinct-(position, value) cardinality. A duplicate
    * doc contributes edges ∝ its own frame count — flood-linear, the
    * planted-flood MultimodalSpec case asserts it. Returns
    * (a_id, b_id). */
  def videoDedupEdges(docs: DataFrame, stride: Int = 10,
      maxHamming: Int = 3): DataFrame =
    videoDedupEdgesFromFrames(
      videoFrameHashes(docs, stride).localCheckpoint(), maxHamming)

  /** The edge construction over an already-hashed (doc_id, frame_idx,
    * fhash) frame — split out so specs can plant frame floods without
    * synthesizing Y4M bytes. */
  private[graft] def videoDedupEdgesFromFrames(frames: DataFrame,
      maxHamming: Int): DataFrame = {
    val members = frames.select(col("doc_id"), col("frame_idx"),
      col("fhash"))
    val reps = members.groupBy(col("frame_idx"), col("fhash"))
      .agg(min(col("doc_id")).as("rep"))
    // star: each member to its group representative (distinct — a doc
    // sharing several positions with the same rep is still one edge)
    val star = members.join(reps, Seq("frame_idx", "fhash"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a_id"), col("doc_id").as("b_id"))
      .distinct()
    val valuePairs = bandedHashValuePairs(
      members.select(col("fhash").as("ahash")).distinct(), maxHamming)
    val repEdges = valuePairs
      .join(reps.select(col("frame_idx").as("fi"),
        col("fhash").as("ha"), col("rep").as("a_id")), Seq("ha"))
      .join(reps.select(col("frame_idx").as("fj"),
        col("fhash").as("hb"), col("rep").as("b_id")), Seq("hb"))
      .filter(col("fi") === col("fj"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    star.unionByName(repEdges)
  }

  // ------------------------------------------------- JPEG leg (P11g)
  // The format real crawls actually contain, and the one leg the
  // codec-free parsers above can't stand in for: decode goes through
  // javax.imageio (JVM-public, no native codec install). Because JPEG
  // is LOSSY, the decoded pixels are not oracle-replayable — the
  // cross-engine claims are the DETERMINISTIC ones (did it decode, the
  // header dims) plus a fidelity GATE (mean |decoded − source| within
  // a measured tolerance), the same thresholded-boolean pattern as
  // ann_recall. Encoding also happens through imageio, so the bytes
  // are deterministic within one JRE — the synthesizer stands in for
  // crawl bytes exactly like synthPpm/synthPng do.

  /** A real baseline JPEG with the SAME dims formula and LCG byte
    * stream as [[synthPpm]]/[[synthPng]] — GRAYSCALE (one LCG byte per
    * pixel): imageio's RGB JPEG path always chroma-subsamples, which
    * on a noise corpus costs ~50 MAE and would drown the fidelity
    * gate's signal; luma-only keeps the q=1.0 round-trip tight
    * (measured MAE ≤ ~5) so the gate cleanly separates a sane decode
    * from garbage (~85 on noise). */
  private[graft] def synthJpeg(seed: Long,
      quality: Float = 1.0f): Array[Byte] = {
    val w = 4 + math.floorMod(seed, 29).toInt
    val h = 4 + math.floorMod(seed >> 16, 29).toInt
    val px = lcgBytes(seed, w * h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          java.lang.Byte.toUnsignedInt(px(y * w + x)))
        x += 1
      }
      y += 1
    }
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** JPEG record: the binary column plus the seed the fidelity gate
    * regenerates the source pixels from (a production pipeline would
    * carry the upstream checksum/reference instead). */
  case class JpegRecord(doc_id: Long, seed: Long, media: Array[Byte])

  /** Binary JPEG table over the doc_id ≡ 1 mod 3 slice (the PPM leg
    * owns ≡ 0). Corruption is planted deterministically: every
    * doc_id ≡ 0 mod 89 is cut to a 20-byte PREFIX — the connection
    * that dropped right after the SOI/JFIF header, so no scan data
    * exists and a partial decode is impossible; imageio faults and the
    * row is QUARANTINED downstream (never dropped). */
  def jpegTable(docs: DataFrame): DataFrame = {
    implicit val recEnc = Encoders.product[JpegRecord]
    implicit val inEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val seed = textSeed(text)
        val bytes = synthJpeg(seed)
        val media =
          if (id % 89 == 0) bytes.take(20) // truncated download
          else bytes
        JpegRecord(id, seed, media)
      }).toDF()
  }

  case class JpegFeatures(doc_id: Long, decode_ok: Boolean,
      error: Option[String], src_w: Option[Int], src_h: Option[Int],
      fidelity_ok: Option[Boolean])

  /** JPEG decode → fidelity features (SURVEY.md §2 P11g): full imageio
    * decode per record inside one mapPartitions (one reader init per
    * batch — the JNI/FFI shape), QUARANTINE on any decode fault
    * (decode_ok=false + the error string, never a silent drop), and
    * the lossy-codec gate: mean |decoded − source| luma error must
    * stay within `tol` (r13 measured ≤ 0.25 on the LCG-noise corpus
    * at quality 1.0 across sf0.001/0.01/0.1 — noise is DCT's worst
    * case, so real images sit far inside; a garbage/mis-decoded frame
    * scores ~85). Narrow, no shuffle, one bounded row per image. */
  def jpegDecodedFeatures(docs: DataFrame,
      tol: Double = 24.0): DataFrame = {
    implicit val recEnc = Encoders.product[JpegRecord]
    implicit val outEnc = Encoders.product[JpegFeatures]
    jpegTable(docs).as[JpegRecord]
      .mapPartitions(_.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.media))
          if (img == null)
            JpegFeatures(r.doc_id, decode_ok = false,
              Some("imageio: unreadable stream"), None, None, None)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val src = lcgBytes(r.seed, w * h)
            val raster = img.getRaster
            var absErr = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                absErr += math.abs(raster.getSample(x, y, 0)
                  - java.lang.Byte.toUnsignedInt(src(y * w + x)))
                x += 1
              }
              y += 1
            }
            val mae = absErr.toDouble / (w * h)
            JpegFeatures(r.doc_id, decode_ok = true, None,
              Some(w), Some(h), Some(mae <= tol))
          }
        } catch {
          case e: Exception =>
            JpegFeatures(r.doc_id, decode_ok = false,
              Some(s"imageio: ${e.getClass.getSimpleName}"),
              None, None, None)
        }
      }).toDF()
  }
}
