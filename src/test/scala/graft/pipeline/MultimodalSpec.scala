package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("media table carries binary column with typed metadata") {
    val media = Multimodal.mediaTable(Tables.load(spark, TestSpark.sf, "documents"))
    val schema = media.schema
    assert(schema("media").dataType.typeName == "binary")
    assert(schema("mime").dataType.typeName == "string")
  }

  test("decoders parse REAL format bytes (PPM / WAV / Y4M)") {
    // synthesized payloads are genuine standard-format files; the
    // decoders parse headers, they don't hash bytes
    val ppm = Multimodal.synthPpm(12345L)
    assert(new String(ppm, 0, 2, "US-ASCII") == "P6")
    val (w, h) = Multimodal.parsePpm(ppm)
    assert(w >= 4 && h >= 4)
    assert(ppm.length > w * h * 3) // header + full RGB payload

    val wav = Multimodal.synthWav(98765L)
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    val (rate, samples) = Multimodal.parseWav(wav)
    assert(rate == 8000 && samples >= 64)
    assert(wav.length == 44 + samples * 2)

    val y4m = Multimodal.synthY4m(555L)
    assert(new String(y4m, 0, 9, "US-ASCII") == "YUV4MPEG2")
    val (vw, vh, offs) = Multimodal.parseY4m(y4m)
    assert(vw == 8 && vh == 8 && offs.nonEmpty)
    assert(y4m.length == offs.last + vw * vh * 3 / 2)
  }

  test("textSeed folds Unicode code points, not UTF-16 code units") {
    // U+1F600 is ONE code point but TWO UTF-16 units; the DuckDB oracle
    // folds unicode(ch) per code point, so the seed must be 0x1F600 —
    // a charAt loop would fold the surrogate pair (r6 advice).
    assert(Multimodal.textSeed(new String(Character.toChars(0x1F600))) ==
      0x1F600L)
    // BMP text is unchanged vs the code-unit fold
    assert(Multimodal.textSeed("ab") == 'a'.toLong * 31 + 'b'.toLong)
  }

  test("frame sampling yields ceil(n_frames/stride) REAL frames per video") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val feats = Multimodal.features(docs)
      .filter(org.apache.spark.sql.functions.col("mime").startsWith("video/"))
      .select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val frames = Multimodal.sampleFrames(docs, stride = 10)
    val counts = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == feats.keySet)
    counts.foreach { case (id, n) =>
      assert(n == math.ceil(feats(id) / 10.0).toLong, s"doc $id")
    }
    // frames are real 4:2:0 payloads: 8×8×1.5 = 96 bytes each
    val sizes = frames.select("frame_bytes").collect()
      .map(_.getAs[Array[Byte]](0).length).distinct
    assert(sizes.toSeq == Seq(96))
  }

  test("decode is deterministic and preserves row count") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val f1 = Multimodal.features(docs).orderBy("doc_id").collect()
    val f2 = Multimodal.features(docs).orderBy("doc_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.length == docs.count())
    val byMime = f1.groupBy(_.getAs[String]("mime"))
    // images decoded to real dimensions, audio to real sample counts
    byMime("image/x-portable-pixmap").foreach { r =>
      assert(r.getAs[Int]("width") >= 4 && r.getAs[Int]("height") >= 4)
    }
    byMime("audio/wav").foreach { r =>
      assert(r.getAs[Int]("sample_rate") == 8000 &&
        r.getAs[Long]("n_samples") >= 64)
    }
    byMime("video/x-yuv4mpeg").foreach { r =>
      assert(r.getAs[Int]("n_frames") >= 1)
    }
  }

  test("resizeImages: output is a valid P6 whose bytes are the exact nearest-neighbor sample") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val out = Multimodal.resizeImages(docs, tw = 8, th = 8).collect()
    assert(out.nonEmpty)
    // source payloads for byte-level comparison
    val srcByDoc = Multimodal.mediaTable(docs)
      .filter(org.apache.spark.sql.functions.col("mime").startsWith("image/"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media"))
      .toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val resized = r.getAs[Array[Byte]]("resized")
      // a REAL P6 that the repo's own parser round-trips
      assert(Multimodal.parsePpm(resized) == ((8, 8)))
      assert(resized.length == 203 && r.getAs[Long]("out_len") == 203L)
      val src = srcByDoc(id)
      val (w, h) = Multimodal.parsePpm(src)
      val srcOff = Multimodal.ppmPixelOffset(src)
      val outOff = Multimodal.ppmPixelOffset(resized)
      var sum = 0L
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3) {
        val sx = x * w / 8
        val sy = y * h / 8
        val expect = src(srcOff + 3 * (sy * w + sx) + c)
        val got = resized(outOff + 3 * (y * 8 + x) + c)
        assert(got == expect, s"doc $id pixel ($x,$y,$c)")
        sum += java.lang.Byte.toUnsignedInt(expect)
      }
      assert(r.getAs[Long]("px_sum") == sum)
    }
  }

  test("audioFeatures: abs-sum and zero crossings match an independent ByteBuffer decode") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val out = Multimodal.audioFeatures(docs).collect()
    assert(out.nonEmpty)
    val srcByDoc = Multimodal.mediaTable(docs)
      .filter(org.apache.spark.sql.functions.col("mime").startsWith("audio/"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media"))
      .toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = srcByDoc(id)
      // independent decode: ByteBuffer's own little-endian short view
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val n = r.getAs[Long]("n_samples").toInt
      val samples = (0 until n).map(i => bb.getShort(44 + 2 * i).toInt)
      assert(r.getAs[Int]("sample_rate") == 8000)
      assert(r.getAs[Long]("abs_sum") == samples.map(s => math.abs(s).toLong).sum)
      val zc = samples.sliding(2).count(p => (p(0) >= 0) != (p(1) >= 0))
      assert(r.getAs[Long]("zero_crossings") == zc.toLong)
    }
  }

  // handcrafted 8x8 P6 (identity nearest-neighbor map at tw=th=8) with
  // per-pixel gray level chosen by a function — pixel-exact control
  private def p6(px: (Int, Int) => Int): Array[Byte] = {
    val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 8 * 8 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
      out(header.length + 3 * (y * 8 + x) + c) = px(x, y).toByte
    out
  }

  test("ahashOf: uniform image hashes to 0; a lone bright pixel sets its bit") {
    assert(Multimodal.ahashOf(p6((_, _) => 100), 8, 8) == 0L)
    val one = p6((x, y) => if (x == 2 && y == 1) 255 else 0)
    assert(Multimodal.ahashOf(one, 8, 8) == (1L << 10)) // p = 1*8+2
  }

  test("ahashOf: near-dup perturbation moves few bits; strict above-mean rule") {
    // checkerboard: half bright half dark — bright bits set
    val base = p6((x, y) => if ((x + y) % 2 == 0) 200 else 10)
    val h0 = Multimodal.ahashOf(base, 8, 8)
    assert(java.lang.Long.bitCount(h0) == 32)
    // flip ONE dark pixel bright: that bit turns on; the mean moves a
    // little but crosses no other pixel's threshold
    val pert = p6((x, y) =>
      if (x == 3 && y == 3) 200 else if ((x + y) % 2 == 0) 200 else 10)
    val h1 = Multimodal.ahashOf(pert, 8, 8)
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2)
    assert(((h1 >> 27) & 1L) == 1L) // p = 3*8+3
    // exactly-at-mean pixels are NOT set (strict >): all-equal already
    // proves it; a two-level image where one level IS the mean would too
  }

  test("imageHashPairs equals brute-force hamming pairs (banding recall 1)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val hashes = Multimodal.imageAHash(docs)
      .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
      .collect()
    assert(hashes.nonEmpty)
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val banded = Multimodal.imageHashPairs(docs, maxHamming = 3)
      .as[(Long, Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
      .collect().toSet
    assert(banded == brute)
  }

  test("hashPairs under an identical-hash FLOOD equals brute force (distinct-value banding)") {
    // 120 byte-identical placeholder images (one hash) + near hashes at
    // hamming 1/3 + a far hash: the candidate JOIN must see 4 distinct
    // values, while the OUTPUT is still the complete true pair relation
    import spark.implicits._
    val flood = (1L to 120L).map(i => (i, 0x0f0f0f0f0f0f0f0fL))
    val rows = flood ++ Seq(
      (200L, 0x0f0f0f0f0f0f0f0eL), // hamming 1 from the flood hash
      (201L, 0x0f0f0f0f0f0f0f0bL), // hamming 2
      (202L, 0xf0f0f0f0f0f0f0f0L)) // far: pairs with nothing
    val hashes = rows.toDF("doc_id", "ahash")
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.hashPairs(hashes, maxHamming = 3)
      .as[(Long, Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)])
      .collect().toSet
    assert(got == brute)
    assert(brute.size >= 120 * 119 / 2, "the flood's pairs are all present")
  }

  test("hashDedupEdges: LINEAR edge count under a flood, identical keep set") {
    // 20k copies of one hash: the complete pair relation is ~2*10^8
    // rows; the keep path must carry ~2*10^4 star edges and decide the
    // same components
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val n = 20000L
    val flood = spark.range(1, n + 1)
      .select(col("id").as("doc_id"), lit(0x1234567812345678L).as("ahash"))
    val near = Seq((n + 5L, 0x1234567812345679L), // hamming 1: joins the CC
      (n + 9L, 0x8765432187654321L)) // far: its own component
      .toDF("doc_id", "ahash")
    val hashes = flood.unionByName(near)
    val edges = Multimodal.hashDedupEdges(hashes, maxHamming = 3)
    val nEdges = edges.count()
    assert(nEdges == (n - 1) + 1,
      s"flood must yield star + one rep edge, got $nEdges")
    val kept = graft.pipeline.Dedup.keepAfterNearDedup(
        hashes.select(col("doc_id")), edges)
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    // component {1..20000, 20005} keeps 1; the far hash keeps itself
    assert(kept.toSeq == Seq(1L, n + 9L), s"kept ${kept.toSeq}")
  }

  test("audioFingerprint: envelope bits follow loud/quiet windows; banding equals brute force") {
    // hand-built WAV: 128 samples, first half amplitude 1000, second
    // half silence — 64 windows of 2 samples, so bits 0..31 must be
    // set (above the stream mean) and 32..63 clear
    val n = 128
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(n * 2)
    (0 until n).foreach(i => bb.putShort(if (i < n / 2) 1000 else 0))
    assert(Multimodal.envelopeHash(bb.array()) == 0x00000000ffffffffL)
    // scale-invariance: double the gain, same fingerprint
    val bb2 = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.put(java.util.Arrays.copyOfRange(bb.array(), 0, 44))
    (0 until n).foreach(i => bb2.putShort(if (i < n / 2) 2000 else 0))
    assert(Multimodal.envelopeHash(bb2.array()) == 0x00000000ffffffffL)
    // banding over the real corpus + planted copies equals brute force
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(999999L))
    val all = docs.unionByName(planted)
    val fps = Multimodal.audioFingerprint(all)
      .as[(Long, Long)].collect()
    assert(fps.nonEmpty)
    val brute = (for {
      (a, ha) <- fps; (b, hb) <- fps if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(brute.nonEmpty, "planted copies must pair")
    val banded = Multimodal.audioHashPairs(all, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute)
  }

  test("videoNearDupPairs equals brute force over same-position frame hashes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 2)
      .withColumn("doc_id", col("doc_id") + lit(999999L))
    val all = docs.unionByName(planted)
    val frames = Multimodal.videoFrameHashes(all, stride = 10)
      .as[(Long, Int, Long)].collect()
    assert(frames.nonEmpty)
    val pairBuf = scala.collection.mutable.Map.empty[(Long, Long), Long]
    frames.groupBy(_._2).values.foreach { samePos =>
      for {
        (a, _, ha) <- samePos
        (b, _, hb) <- samePos
        if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
      } pairBuf((a, b)) = pairBuf.getOrElse((a, b), 0L) + 1L
    }
    val brute = pairBuf.map { case ((a, b), n) => (a, b, n) }.toSet
    assert(brute.nonEmpty, "planted video copies must pair")
    val got = Multimodal.videoNearDupPairs(all, stride = 10,
        maxHamming = 3, minMatches = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    // a planted exact copy matches on EVERY sampled frame: n_matched =
    // ceil(vf / 10) for at least one pair
    val byDoc = frames.groupBy(_._1).view.mapValues(_.length).toMap
    assert(got.exists { case (a, b, n) =>
      b == a + 999999L && n.toInt == byDoc(a)
    }, "an exact re-ingest must match all sampled positions")
  }

  test("videoDedupEdges: LINEAR under a ≥1k clip flood, CC-identical keep set") {
    // 2000 re-crawled copies of one 5-frame clip (the test-pattern
    // case the edge builder exists for): the complete pair relation is
    // ~2·10^6 rows before the CC starts; the edge path must carry ONE
    // edge per copy (star, distinct across positions) plus one rep
    // edge for the near clip — linear in copies — and decide the same
    // components
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val n = 2000L
    val clip = (0 until 5).map(i => (i, 0x1111111111111111L * (i + 1)))
    val flood = spark.range(1, n + 1).select(col("id").as("doc_id"))
      .crossJoin(clip.toDF("frame_idx", "fhash"))
    val near = Seq((n + 5L, 0, 0x1111111111111110L), // pos-0 hamming 1
      (n + 5L, 1, 0x0f0f0f0f00000000L)) // far from every clip hash
      .toDF("doc_id", "frame_idx", "fhash")
    val far = Seq((n + 9L, 0, 0x123456789abcdef0L))
      .toDF("doc_id", "frame_idx", "fhash")
    val frames = flood.unionByName(near).unionByName(far)
    val edges = Multimodal.videoDedupEdgesFromFrames(frames, maxHamming = 3)
    val nEdges = edges.count()
    assert(nEdges == (n - 1) + 1,
      s"flood must yield one star edge per copy + one rep edge, got $nEdges")
    val kept = graft.pipeline.Dedup.keepAfterNearDedup(
        frames.select(col("doc_id")).distinct(), edges)
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    // component {1..2000, 2005} keeps 1; the far clip keeps itself
    assert(kept.toSeq == Seq(1L, n + 9L), s"kept ${kept.toSeq}")
  }

  test("videoDedupEdges keep set equals the complete pair relation's (real corpus)") {
    // the connectivity-equivalence claim, asserted directly: CC min-id
    // keep over the LINEAR star+rep edge set == CC min-id keep over
    // videoNearDupPairs' complete relation (minMatches = 1), on the
    // real corpus with planted re-ingests — the exact pair the oracled
    // driver key rides
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), col("text"))
    val planted = docs.filter(pmod(col("doc_id"), lit(30)) === 2)
      .withColumn("doc_id", col("doc_id") + lit(999999L))
    val all = docs.unionByName(planted)
    val vids = all.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"))
    def keepSet(pairs: org.apache.spark.sql.DataFrame): Seq[Long] =
      graft.pipeline.Dedup.keepAfterNearDedup(vids, pairs)
        .as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted.toSeq
    val viaEdges = keepSet(
      Multimodal.videoDedupEdges(all, stride = 10, maxHamming = 3))
    val viaComplete = keepSet(
      Multimodal.videoNearDupPairs(all, stride = 10, maxHamming = 3,
          minMatches = 1)
        .select(col("a").as("a_id"), col("b").as("b_id")))
    assert(viaEdges.nonEmpty && viaEdges == viaComplete)
  }

  test("synthPng round-trips: decode recovers the exact LCG pixel stream") {
    val seed = 987654L
    val png = Multimodal.synthPng(seed)
    // spec-conformant signature
    assert((png(0) & 0xff) == 0x89 &&
      new String(png, 1, 3, "US-ASCII") == "PNG")
    val img = Multimodal.parsePng(png).toOption.get
    val w = 4 + math.floorMod(seed, 29).toInt
    val h = 4 + math.floorMod(seed >> 16, 29).toInt
    assert(img.w == w && img.h == h)
    // the decoded (inflated + unfiltered) pixels ARE the LCG stream —
    // same bytes the PPM path embeds raw
    val ppm = Multimodal.synthPpm(seed)
    val off = Multimodal.ppmPixelOffset(ppm)
    assert(java.util.Arrays.equals(img.px,
      java.util.Arrays.copyOfRange(ppm, off, off + w * h * 3)))
  }

  test("parsePng reconstructs all five scanline filter types") {
    // hand-FILTER a known image with each type and demand the decoder
    // undo it exactly (the synthesizer only emits type 0, so types 1-4
    // are exercised here)
    val (w, h) = (5, 4)
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 251).toByte)
    def b(a: Array[Byte], i: Int) =
      if (i < 0) 0 else java.lang.Byte.toUnsignedInt(a(i))
    (0 to 4).foreach { f =>
      val stride = 1 + w * 3
      val raw = new Array[Byte](h * stride)
      for (y <- 0 until h) {
        raw(y * stride) = f.toByte
        for (x <- 0 until w * 3) {
          val cur = b(px, y * w * 3 + x)
          val left = if (x >= 3) b(px, y * w * 3 + x - 3) else 0
          val up = if (y > 0) b(px, (y - 1) * w * 3 + x) else 0
          val ul = if (y > 0 && x >= 3) b(px, (y - 1) * w * 3 + x - 3) else 0
          val predicted = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val (pa, pb, pc) =
                (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          raw(y * stride + 1 + x) = ((cur - predicted) & 0xff).toByte
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val out = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
        val t = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(t); crc.update(body)
        java.nio.ByteBuffer.allocate(12 + body.length)
          .putInt(body.length).put(t).put(body).putInt(crc.getValue.toInt)
          .array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte)
        .put(0.toByte).array()
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n',
        0x1a, '\n') ++ chunk("IHDR", ihdr) ++
        chunk("IDAT", out.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
      val img = Multimodal.parsePng(png)
        .fold(e => fail(s"filter $f: $e"), identity)
      assert(java.util.Arrays.equals(img.px, px), s"filter $f mismatch")
    }
  }

  test("PNG corruption is quarantined with its error, never dropped") {
    val png = Multimodal.synthPng(4242L)
    val bad = png.clone()
    bad(8 + 25 + 8) = (bad(8 + 25 + 8) ^ 0xff).toByte // IDAT payload
    assert(Multimodal.parsePng(bad) == Left("CRC mismatch in IDAT"))
    assert(Multimodal.parsePng(png.take(20)).isLeft) // truncated
    // end-to-end: the planted corrupt rows surface as quarantine rows
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val feats = Multimodal.pngResizedFeatures(docs)
    import org.apache.spark.sql.functions._
    val nImages = docs.filter(pmod(col("doc_id"), lit(3)) === 0).count()
    assert(feats.count() == nImages, "quarantine must not drop rows")
    val quarantined = feats.filter(!col("crc_ok"))
    assert(quarantined.count() ==
      docs.filter(pmod(col("doc_id"), lit(3)) === 0 &&
        col("doc_id") % 97 === 0).count())
    assert(quarantined.filter(col("px_sum").isNotNull).count() == 0)
  }

  test("pngResizedFeatures px_sum equals the PPM resize path (same pixel stream)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    import org.apache.spark.sql.functions._
    val png = Multimodal.pngResizedFeatures(docs).filter(col("crc_ok"))
      .select(col("doc_id"), col("px_sum"))
    val ppm = Multimodal.resizeImages(docs, 8, 8)
      .select(col("doc_id"), col("px_sum").as("ppm_sum"))
    val joined = png.join(ppm, Seq("doc_id"))
    assert(joined.count() > 0)
    assert(joined.filter(col("px_sum") =!= col("ppm_sum")).count() == 0,
      "decoded-PNG features must equal the raw-PPM features")
  }

  test("jpegDecodedFeatures: imageio round-trip within tolerance, truncations quarantined") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val feats = Multimodal.jpegDecodedFeatures(docs).localCheckpoint()
    // coverage: exactly the doc_id ≡ 1 mod 3 slice, one row each
    assert(feats.count() ==
      docs.filter(pmod(col("doc_id"), lit(3)) === 1).count())
    // quarantine: exactly the planted truncations, features NULL
    val quarantined = feats.filter(!col("decode_ok"))
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(quarantined) ==
      ids(docs.filter(pmod(col("doc_id"), lit(3)) === 1 &&
        col("doc_id") % 89 === 0)))
    assert(quarantined.filter(col("src_w").isNotNull ||
      col("fidelity_ok").isNotNull).count() == 0)
    assert(quarantined.filter(col("error").isNull).count() == 0,
      "a quarantined row must carry its decode error")
    // every healthy image decodes within the fidelity tolerance and
    // reports the synthesizer's dims
    val ok = feats.filter(col("decode_ok"))
    assert(ok.count() > 0)
    assert(ok.filter(!col("fidelity_ok")).count() == 0,
      "q=1.0 grayscale round-trip must stay within the 24 MAE gate")
    assert(ok.filter(col("src_w") < 4 || col("src_w") > 32 ||
      col("src_h") < 4 || col("src_h") > 32).count() == 0)
    // determinism: a second run is bit-identical
    val again = Multimodal.jpegDecodedFeatures(docs)
    assert(feats.exceptAll(again).count() == 0 &&
      again.exceptAll(feats).count() == 0)
  }
}
