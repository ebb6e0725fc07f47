package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** A multimodal record: opaque media bytes + typed envelope. In a real
  * pipeline `media` holds an encoded image/audio/video payload. */
case class MediaRecord(doc_id: Long, media: Array[Byte])

/** Decoded media metadata (the output of the decode stage). */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     n_frames: Int, n_sampled_frames: Int, checksum: Long)

/** Extracted media features (the output of the feature-extract stage). */
case class MediaFeatures(doc_id: Long, features: Array[Float])

/** One sampled frame (the output of the frame-sample stage). */
case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

/** A 63-bit perceptual hash (the output of the image-hash stage). */
case class MediaHash(doc_id: Long, phash: Long)

/** Multimodal-column plumbing for LLM-data pipelines: media as opaque
  * `binary` columns with typed metadata, decoded batch-wise in executors via
  * `Dataset.mapPartitions` (the JVM analogue of `mapInPandas`: one iterator
  * per partition, so a real decoder could amortize codec/model setup across
  * the batch).
  *
  * Codec status: UNCOMPRESSED containers are parsed for REAL in pure JVM
  * — [[Multimodal.parseWav]] (RIFF/WAVE PCM: chunk walk, odd-size
  * padding, fmt/data fields, amplitude fold) and [[Multimodal.parseBmp]]
  * (24-bit BITMAPINFOHEADER: pixel-array offset, BGR order, 4-byte row
  * stride), each cross-validated in-spec against the JDK's own readers
  * (`javax.sound.sampled.AudioSystem`, `javax.imageio.ImageIO`) and
  * driver-gated against closed-form oracles over spec-built files.
  * [[Multimodal.parsePng]] decodes REAL compressed PNGs (DEFLATE via
  * `java.util.zip`, all five scanline filters, CRC-verified chunks),
  * cross-validated pixel-by-pixel against `javax.imageio`. LOSSY codecs
  * (JPEG/MP3/MP4 — DCT/entropy decoders with no JDK implementation)
  * remain the documented stub ([[Multimodal.decodeStub]], a deterministic
  * fake), keeping the batched `mapPartitions` plumbing (schema,
  * partitioning, batch shape, encoder round-trip) real and the codec call
  * swappable.
  */
object Multimodal {
  private type Q = (SparkSession, String) => DataFrame

  /** STUB decoder: a real implementation would parse the container header
    * (JPEG/PNG/WAV/MP4) here. This fake derives plausible metadata
    * deterministically from the payload so results are oracle-checkable. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val n = r.media.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += (r.media(i) & 0xff); i += 1 }
    val frames = n / 64 + 1
    MediaMeta(
      doc_id = r.doc_id,
      n_bytes = n,
      width = 32 + n % 600,
      height = 32 + (n * 7) % 400,
      n_frames = frames,
      n_sampled_frames = (frames + 3) / 4, // every-4th-frame sampling
      checksum = sum % 997)
  }

  /** documents.text → fake media bytes (UTF-8) → batched decode. */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // per-partition setup would open the codec once here
        it.map(decodeStub)
      }
  }

  /** STUB feature extractor: a real implementation would run an image/audio
    * embedding model over the decoded frames. This fake derives an 8-dim
    * vector from byte-position sums so shape/partitioning/encoder plumbing is
    * real and the oracle can recompute it. */
  def extractFeaturesStub(r: MediaRecord): MediaFeatures = {
    val dims = 8
    val acc = new Array[Long](dims)
    var i = 0
    while (i < r.media.length) { acc(i % dims) += (r.media(i) & 0xff); i += 1 }
    MediaFeatures(r.doc_id, acc.map(a => (a % 1000L) / 1000.0f))
  }

  /** documents.text → fake media bytes → batched feature extraction
    * (embedding column ready for [[Similarity.annTopK]]). */
  def extractFeatures(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map(extractFeaturesStub)) // model loads once per partition
  }

  /** STUB resize: a real implementation re-encodes the image at the target
    * dims; the fake truncates/pads the payload to w*h/64 bytes. */
  def resizeStub(r: MediaRecord, w: Int, h: Int): MediaRecord = {
    val target = math.max(1, w * h / 64)
    MediaRecord(r.doc_id, java.util.Arrays.copyOf(r.media, target))
  }

  /** Video-style FRAME SAMPLING: the payload is treated as `frameBytes`
    * windows (the same frame geometry as [[decodeStub]]'s `n_frames`) and
    * every `stride`-th frame is emitted — the every-Nth-frame subsampling a
    * video pipeline runs before feature extraction. Frame content rides as
    * (length, checksum) so the oracle can recompute it; a real decoder
    * would emit the frame bytes for a downstream [[extractFeatures]].
    * Plumbing is the real shape: one `flatMap` per record inside a
    * `mapPartitions` batch (codec opened once per partition), narrow and
    * shuffle-free, output rows ∝ payload bytes / (frameBytes·stride). */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): Dataset[FrameSample] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions { it => // per-partition setup would open the codec once
        it.flatMap { r =>
          val n = r.media.length
          val frames = n / frameBytes + 1
          (0 until frames by stride).iterator.map { fi =>
            val start = fi * frameBytes
            val end = math.min(start + frameBytes, n)
            var sum = 0L
            var i = start
            while (i < end) { sum += (r.media(i) & 0xff); i += 1 }
            FrameSample(r.doc_id, fi, math.max(0, end - start), sum % 997)
          }
        }
      }
  }

  /** STUB perceptual hash (average hash): the payload split into 63
    * positional blocks, bit b set when block b's byte mean exceeds the
    * whole-payload mean — compared CROSS-MULTIPLIED (`blockSum·n >
    * total·blockLen`), so the signature is pure integer arithmetic. 63
    * (not 64) blocks keeps the signature in a signed long without sign
    * games — the winnow argmin <2⁵³-packing posture. A real image aHash
    * computes the same structure over 8×8 downsampled luma; the fake
    * keeps it byte-positional so the oracle can recompute it. */
  def aHashStub(r: MediaRecord): MediaHash = {
    val n = r.media.length
    val blocks = 63
    val sums = new Array[Long](blocks)
    val lens = new Array[Long](blocks)
    var i = 0
    while (i < n) {
      val b = (i.toLong * blocks / n).toInt
      sums(b) += (r.media(i) & 0xff); lens(b) += 1; i += 1
    }
    val total = sums.sum
    var h = 0L
    var b = 0
    while (b < blocks) {
      if (lens(b) > 0 && sums(b) * n > total * lens(b)) h |= (1L << b)
      b += 1
    }
    MediaHash(r.doc_id, h)
  }

  /** media → 63-bit perceptual hashes (batched like every decode stage). */
  def imageHashes(docs: DataFrame): Dataset[MediaHash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRecord]
      .mapPartitions(_.map(aHashStub))
  }

  /** Image near-dup pairs by perceptual hash: banded blocking (the
    * [[Dedup.simhashPairs]] guarantee — hamming ≤ maxHamming over
    * maxHamming+1 bands leaves SOME band identical, so the equi-join on
    * (band, value) recalls every qualifying pair) + exact popcount
    * verification. Extends the dedup family to the image modality on the
    * same plumbing the other multimodal stages use. */
  def imagePhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    val width = 16 // 4 bands × 16 bits cover the 63-bit signature
    // the decode+hash table feeds BOTH self-join sides — the Dedup
    // sharedStage reuse point (decoding every image twice is the single
    // dominant cost here)
    val h = Dedup.sharedStage(imageHashes(docs).toDF())
    val banded = h.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .withColumn("bv", expr(s"shiftright(phash, CAST(b * $width AS INT)) & 65535"))
    // first-shared-band dedup (r17, the simhashPairs form): both band
    // values are bit-slices of the phash each row already carries, so a
    // pair colliding in several bands keeps exactly the row whose `b` is
    // the first agreeing band — a pure per-row predicate, no distinct()
    // exchange of the candidate stream
    def bandVal(p: Column, i: Int): Column =
      shiftright(p, i * width).bitwiseAND(lit(65535L))
    val firstShared = Dedup.firstSharedIndex(bands)(i =>
      bandVal(col("x.phash"), i) === bandVal(col("y.phash"), i))
    banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .where(col("x.b") === firstShared)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  // ---- REAL uncompressed-container codecs (pure JVM — no external libs)

  /** Parsed RIFF/WAVE metadata + the PCM amplitude sum. */
  case class WavMeta(doc_id: Long, sample_rate: Long, channels: Long,
                     bits_per_sample: Long, n_samples: Long,
                     duration_us: Long, sum_abs: Long)

  /** Parsed BMP metadata + the blue-channel sum. */
  case class BmpMeta(doc_id: Long, width: Long, height: Long, bpp: Long,
                     n_pixels: Long, sum_blue: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff).toLong) | ((b(o + 1) & 0xff).toLong << 8) |
      ((b(o + 2) & 0xff).toLong << 16) | ((b(o + 3) & 0xff).toLong << 24)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
  }

  /** REAL RIFF/WAVE parser (PCM): walks the chunk list (any chunk order,
    * odd-size padding per spec), reads the fmt fields, and folds the data
    * chunk's samples into an integer amplitude sum (8-bit: |v−128|;
    * 16-bit LE: |v|). Pure JVM — uncompressed WAV needs no codec library;
    * compressed audio (MP3/AAC) remains the documented stub. */
  def parseWav(id: Long, b: Array[Byte]): WavMeta = {
    require(b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE", s"record $id: not a RIFF/WAVE")
    var off = 12
    var rate = 0L; var ch = 0L; var bps = 0L
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= b.length) {
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = u32(b, off + 4)
      // a corrupt size (> file length, or >= 2^31 which would wrap
      // negative in toInt) must fail loudly, not walk `off` backwards
      // into an infinite loop on an executor task
      require(off + 8L + sz <= b.length,
        s"record $id: corrupt chunk size $sz at offset $off")
      if (cid == "fmt ") {
        require(u16(b, off + 8) == 1, s"record $id: not PCM")
        ch = u16(b, off + 10); rate = u32(b, off + 12)
        bps = u16(b, off + 22)
      } else if (cid == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz.toInt + (sz % 2).toInt // odd chunks pad one byte
    }
    require(rate > 0 && ch > 0 && bps > 0 && dataOff >= 0,
      s"record $id: missing fmt/data chunk")
    val n = dataLen / (ch * bps / 8)
    var sum = 0L
    var i = 0
    if (bps == 8) while (i < dataLen) {
      sum += math.abs((b(dataOff + i) & 0xff) - 128); i += 1
    } else if (bps == 16) while (i + 1 < dataLen) {
      sum += math.abs(u16(b, dataOff + i).toShort.toInt); i += 2
    }
    WavMeta(id, rate, ch, bps, n, n * 1000000L / rate, sum)
  }

  /** Deterministic 8-bit mono PCM WAV for the gate: rate keyed off the
    * id, `nSamples` samples with a position-derived (chain-free, so the
    * oracle can recompute per-index) pseudo-waveform. */
  def synthWav(id: Long, nSamples: Int): Array[Byte] = {
    val rate = 8000L + (id % 4) * 4000L
    val b = new Array[Byte](44 + nSamples)
    "RIFF".getBytes("US-ASCII").copyToArray(b, 0)
    putU32(b, 4, 36L + nSamples)
    "WAVE".getBytes("US-ASCII").copyToArray(b, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(b, 12)
    putU32(b, 16, 16L); putU16(b, 20, 1); putU16(b, 22, 1)
    putU32(b, 24, rate); putU32(b, 28, rate) // byteRate = rate at 8-bit mono
    putU16(b, 32, 1); putU16(b, 34, 8)
    "data".getBytes("US-ASCII").copyToArray(b, 36)
    putU32(b, 40, nSamples.toLong)
    val x0 = (id * 1103515245L + 12345L) % 2147483648L
    var i = 0
    while (i < nSamples) {
      b(44 + i) = ((((x0 + i * 2654435761L) % 2147483648L) >> 16) & 0xff).toByte
      i += 1
    }
    b
  }

  /** REAL BMP parser (24-bit uncompressed BITMAPINFOHEADER): reads the
    * pixel-array offset, dimensions, and depth from the headers and folds
    * the blue channel (BGR order) into an integer sum, honoring the
    * 4-byte row stride. Compressed images (JPEG/PNG) remain the
    * documented stub. */
  def parseBmp(id: Long, b: Array[Byte]): BmpMeta = {
    require(b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte,
      s"record $id: not a BMP")
    val dataOff = u32(b, 10).toInt
    val w = u32(b, 18); val h = u32(b, 22)
    val bpp = u16(b, 28).toLong
    require(bpp == 24 && u32(b, 30) == 0L, s"record $id: not uncompressed 24-bit")
    val rowSize = ((3 * w + 3) / 4) * 4
    var sum = 0L
    var r = 0
    while (r < h) {
      var c = 0L
      while (c < w) {
        sum += (b(dataOff + (r * rowSize + c * 3).toInt) & 0xff) // BGR: blue first
        c += 1
      }
      r += 1
    }
    BmpMeta(id, w, h, bpp, w * h, sum)
  }

  /** Deterministic 24-bit BMP for the gate: width a multiple of 4 (no
    * row padding, so the oracle's per-index pixel formula maps 1:1 to
    * file offsets), position-derived pixel bytes. */
  def synthBmp(id: Long): Array[Byte] = {
    val w = (8 + (id % 4) * 4).toInt   // 8..20, all multiples of 4
    val h = (8 + (id * 3) % 8).toInt
    val imgSize = 3 * w * h
    val b = new Array[Byte](54 + imgSize)
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    putU32(b, 2, 54L + imgSize); putU32(b, 10, 54L)
    putU32(b, 14, 40L); putU32(b, 18, w.toLong); putU32(b, 22, h.toLong)
    putU16(b, 26, 1); putU16(b, 28, 24); putU32(b, 30, 0L)
    putU32(b, 34, imgSize.toLong); putU32(b, 38, 2835L); putU32(b, 42, 2835L)
    val y0 = (id * 22695477L + 1L) % 2147483648L
    var j = 0
    while (j < imgSize) {
      b(54 + j) = ((((y0 + j * 40503L) % 2147483648L) >> 12) & 0xff).toByte
      j += 1
    }
    b
  }

  /** Parsed PNG metadata + channel sums. */
  case class PngMeta(doc_id: Long, width: Long, height: Long, bit_depth: Long,
                     color_type: Long, n_pixels: Long, sum_red: Long, sum_all: Long)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xff).toLong << 24) | ((b(o + 1) & 0xff).toLong << 16) |
      ((b(o + 2) & 0xff).toLong << 8) | (b(o + 3) & 0xff).toLong
  private def putBe32(b: Array[Byte], o: Int, v: Long): Unit = {
    var i = 0
    while (i < 4) { b(o + i) = ((v >> (8 * (3 - i))) & 0xff).toByte; i += 1 }
  }

  /** REAL PNG decoder (8-bit truecolor, pure JVM — DEFLATE ships in
    * `java.util.zip`): verifies the signature and every chunk's CRC32,
    * parses IHDR (big-endian, unlike BMP/WAV), concatenates the IDAT
    * stream, inflates it, and reverses the per-scanline filter — all five
    * filter types of the spec (None/Sub/Up/Average/Paeth, RFC 2083 §6),
    * including Paeth's three-way predictor tie-breaking and Average's
    * floor((left+up)/2). Folds the reconstructed raw pixels into integer
    * channel sums. This retires the PNG leg of the codec stub; JPEG/MP3
    * (lossy DCT codecs, genuinely out of sandbox reach) remain the
    * documented fake. */
  def parsePng(id: Long, b: Array[Byte]): PngMeta = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    require(b.length >= 8 && b.take(8).sameElements(sig), s"record $id: not a PNG")
    var off = 8
    var w = 0L; var h = 0L; var depth = 0L; var ctype = 0L
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 12 <= b.length) {
      val len = be32(b, off).toInt
      val cid = new String(b, off + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(b, off + 4, 4 + len)
      require(crc.getValue == be32(b, off + 8 + len),
        s"record $id: CRC mismatch in $cid")
      cid match {
        case "IHDR" =>
          w = be32(b, off + 8); h = be32(b, off + 12)
          depth = b(off + 16) & 0xff; ctype = b(off + 17) & 0xff
          require(depth == 8 && ctype == 2 && b(off + 18) == 0 &&
            b(off + 19) == 0 && b(off + 20) == 0,
            s"record $id: only 8-bit non-interlaced truecolor supported")
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: CRC-checked, content ignored
      }
      off += 12 + len
    }
    require(w > 0 && h > 0 && idat.size() > 0, s"record $id: missing IHDR/IDAT")
    val bpp = 3 // bytes per pixel at 8-bit RGB
    val stride = (w * bpp).toInt
    val raw = new Array[Byte](((stride + 1) * h).toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var filled = 0
    var stalled = false // inflate()==0 with input exhausted: truncated
    while (!inf.finished() && filled < raw.length && !stalled) {
      val n = inf.inflate(raw, filled, raw.length - filled)
      if (n == 0) stalled = true else filled += n
    }
    inf.end()
    require(filled == raw.length, s"record $id: truncated IDAT stream")
    // reverse the scanline filters in place; prev = reconstructed row above
    val out = new Array[Byte](stride * h.toInt)
    var r = 0
    while (r < h) {
      val ft = raw(r * (stride + 1)) & 0xff
      val src = r * (stride + 1) + 1
      val dst = r * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0         // left
        val u = if (r > 0) out(dst - stride + i) & 0xff else 0         // up
        val c = if (r > 0 && i >= bpp) out(dst - stride + i - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + u
          case 3 => x + ((a + u) >> 1)
          case 4 => // Paeth: nearest of a/u/c to p = a + u - c, ties a > u > c
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c)
          case t => throw new IllegalArgumentException(s"record $id: filter $t")
        }
        out(dst + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    var sumRed = 0L; var sumAll = 0L
    var j = 0
    while (j < out.length) {
      val v = out(j) & 0xff
      sumAll += v
      if (j % bpp == 0) sumRed += v
      j += 1
    }
    PngMeta(id, w, h, depth, ctype, w * h, sumRed, sumAll)
  }

  /** The decoder's reconstructed raw RGB bytes (row-major, 3 per pixel) —
    * the spec's hook for cross-validating pixel-by-pixel against
    * `javax.imageio` (the JDK's independent PNG implementation). */
  def pngPixels(id: Long, b: Array[Byte]): Array[Byte] = {
    parsePng(id, b) // full validation (signature, CRCs, header constraints)
    var off = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 12 <= b.length) {
      val len = be32(b, off).toInt
      val cid = new String(b, off + 4, 4, "US-ASCII")
      cid match {
        case "IHDR" => w = be32(b, off + 8).toInt; h = be32(b, off + 12).toInt
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ =>
      }
      off += 12 + len
    }
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var filled = 0
    var stalled = false // see parsePng: don't spin on a truncated stream
    while (!inf.finished() && filled < raw.length && !stalled) {
      val n = inf.inflate(raw, filled, raw.length - filled)
      if (n == 0) stalled = true else filled += n
    }
    inf.end()
    require(filled == raw.length, s"record $id: truncated IDAT stream")
    val out = new Array[Byte](stride * h)
    var r = 0
    while (r < h) {
      val ft = raw(r * (stride + 1)) & 0xff
      val src = r * (stride + 1) + 1
      val dst = r * stride
      var i = 0
      while (i < stride) {
        val x = raw(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val u = if (r > 0) out(dst - stride + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) out(dst - stride + i - bpp) & 0xff else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + u
          case 3 => x + ((a + u) >> 1)
          case 4 =>
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c)
          case t => throw new IllegalArgumentException(s"record $id: filter $t")
        }
        out(dst + i) = (recon & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  /** Deterministic 8-bit RGB PNG for the gate: position-derived raw pixel
    * bytes (same closed-form family as [[synthBmp]], so the oracle
    * recomputes them per-index), encoded through the REAL pipeline —
    * per-row filter type r % 5 (every filter of the spec exercised on
    * every image taller than 4 rows), then DEFLATE, then CRC32-sealed
    * chunks. A decoder bug in ANY filter, the inflate handling, chunk
    * walking, or big-endian header parsing breaks the closed-form match. */
  def synthPng(id: Long): Array[Byte] = {
    val w = (6 + (id % 5) * 3).toInt  // 6..18
    val h = (5 + (id * 7) % 9).toInt  // 5..13: every image uses all 5 filters
    val bpp = 3
    val stride = w * bpp
    val z0 = (id * 69069L + 7L) % 2147483648L
    val out = new Array[Byte](stride * h)
    var j = 0
    while (j < out.length) {
      out(j) = ((((z0 + j * 40503L) % 2147483648L) >> 12) & 0xff).toByte
      j += 1
    }
    // apply per-row filters (the encoder side of RFC 2083 §6)
    val filtered = new Array[Byte]((stride + 1) * h)
    var r = 0
    while (r < h) {
      val ft = r % 5
      filtered(r * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = out(r * stride + i) & 0xff
        val a = if (i >= bpp) out(r * stride + i - bpp) & 0xff else 0
        val u = if (r > 0) out((r - 1) * stride + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) out((r - 1) * stride + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => u
          case 3 => (a + u) >> 1
          case 4 =>
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
        }
        filtered(r * (stride + 1) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!defl.finished()) zbuf.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val zb = zbuf.toByteArray
    def chunk(cid: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      putBe32(out, 0, data.length.toLong)
      cid.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      putBe32(out, 8 + data.length, crc.getValue)
      out
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w.toLong); putBe32(ihdr, 4, h.toLong)
    ihdr(8) = 8; ihdr(9) = 2 // 8-bit truecolor, deflate/adaptive/no interlace
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zb) ++ chunk("IEND", Array.empty)
  }

  def decodePng(docs: DataFrame): Dataset[PngMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parsePng(id, synthPng(id))))
  }

  /** Synth → REAL parse, batched per partition like every decode stage. */
  def decodeWav(docs: DataFrame): Dataset[WavMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        parseWav(id, synthWav(id, (400L + nc).toInt))
      })
  }

  def decodeBmp(docs: DataFrame): Dataset[BmpMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => parseBmp(id, synthBmp(id))))
  }

  val queries: Map[String, Q] = Map(
    // REAL container parsing: the WAV/BMP bytes are built to spec from
    // closed-form parameters, the parser reads them back per spec, and
    // the oracle checks the PARSED values against the generation formulas
    // — a parser bug (wrong offset, wrong endianness, missed padding)
    // breaks the match
    "wav_decode" -> ((s, dir) =>
      decodeWav(SparkEntry.table(s, dir, "documents")).toDF()),
    "bmp_decode" -> ((s, dir) =>
      decodeBmp(SparkEntry.table(s, dir, "documents")).toDF()),
    // REAL compressed-image decoding: spec-built PNGs (per-row filters
    // cycling through all five RFC 2083 types, DEFLATE, CRC-sealed chunks)
    // decoded back to raw pixels; the oracle checks the reconstructed
    // channel sums against the closed-form pixel generation formula
    "png_decode" -> ((s, dir) =>
      decodePng(SparkEntry.table(s, dir, "documents")).toDF()),
    // inject-then-detect: every 25th document gets a twin with ONE byte
    // substituted (aligned blocks → hamming ≤ 2, measured), while the
    // closest natural pair sits at hamming 11 — maxHamming 3 recalls
    // exactly the planted twins
    "image_phash_pairs" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val twins = docs.where(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("text"), 1, 9), lit("z"),
            substring(col("text"), 11, 1000000)).as("text"))
      imagePhashPairs(docs.select("doc_id", "text").unionByName(twins))
    }),
    "multimodal_meta" -> ((s, dir) => decodeMeta(SparkEntry.table(s, dir, "documents")).toDF()),
    "multimodal_frames" -> ((s, dir) =>
      sampleFrames(SparkEntry.table(s, dir, "documents")).toDF()),
    // resize to 256×128 → a fixed 512-byte payload (truncate/zero-pad);
    // emitted as (n_bytes, checksum) for the oracle
    "multimodal_resize" -> ((s, dir) => {
      val docs = SparkEntry.table(s, dir, "documents")
      val spark = docs.sparkSession
      import spark.implicits._
      docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .as[MediaRecord]
        .mapPartitions(_.map { r =>
          val rz = resizeStub(r, 256, 128)
          var sum = 0L
          rz.media.foreach(b => sum += (b & 0xff))
          FrameSample(rz.doc_id, 0, rz.media.length, sum % 997)
        })
        .toDF().withColumnRenamed("frame_idx", "pass")
    }),
    "multimodal_features" -> ((s, dir) => {
      val f = extractFeatures(SparkEntry.table(s, dir, "documents")).toDF()
      // flatten for the oracle: one row per (doc, dim)
      f.select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "v")))
        .select(col("doc_id"), col("dim"), col("v").cast("double").as("v"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "wav_decode" ->
      """SELECT doc_id,
        |  8000 + (doc_id % 4) * 4000 AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(8 AS BIGINT) AS bits_per_sample,
        |  400 + n_chars AS n_samples,
        |  (400 + n_chars) * 1000000 // (8000 + (doc_id % 4) * 4000) AS duration_us,
        |  CAST(list_sum(list_transform(range(0, CAST(400 + n_chars AS INT)),
        |    i -> abs(((((doc_id * 1103515245 + 12345) % 2147483648
        |                + i * 2654435761) % 2147483648) // 65536) % 256 - 128)))
        |    AS BIGINT) AS sum_abs
        |FROM documents""".stripMargin,
    "png_decode" ->
      """WITH g AS (SELECT doc_id,
        |    6 + (doc_id % 5) * 3 AS w, 5 + (doc_id * 7) % 9 AS h,
        |    (doc_id * 69069 + 7) % 2147483648 AS z0
        |  FROM documents)
        |SELECT doc_id, w AS width, h AS height,
        |  CAST(8 AS BIGINT) AS bit_depth, CAST(2 AS BIGINT) AS color_type,
        |  w * h AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, CAST(w * h AS INT)),
        |    k -> (((z0 + (3 * k) * 40503) % 2147483648) // 4096) % 256))
        |    AS BIGINT) AS sum_red,
        |  CAST(list_sum(list_transform(range(0, CAST(3 * w * h AS INT)),
        |    j -> (((z0 + j * 40503) % 2147483648) // 4096) % 256))
        |    AS BIGINT) AS sum_all
        |FROM g""".stripMargin,
    "bmp_decode" ->
      """WITH g AS (SELECT doc_id,
        |    8 + (doc_id % 4) * 4 AS w, 8 + (doc_id * 3) % 8 AS h,
        |    (doc_id * 22695477 + 1) % 2147483648 AS y0
        |  FROM documents)
        |SELECT doc_id, w AS width, h AS height, CAST(24 AS BIGINT) AS bpp,
        |  w * h AS n_pixels,
        |  CAST(list_sum(list_transform(range(0, CAST(w * h AS INT)),
        |    k -> (((y0 + (3 * k) * 40503) % 2147483648) // 4096) % 256))
        |    AS BIGINT) AS sum_blue
        |FROM g""".stripMargin,
    // same twin injection, same cross-multiplied block bits, same banded
    // self-join with exact popcount verification
    "image_phash_pairs" ->
      """WITH m AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 9) || 'z' || substr(text, 11)
        |  FROM documents WHERE doc_id % 25 = 0),
        |c AS (SELECT doc_id,
        |        list_transform(string_split_regex(text, ''), ch -> CAST(unicode(ch) AS BIGINT)) AS by
        |      FROM m),
        |e AS (SELECT doc_id, len(by) AS n, (j.j - 1) * 63 // len(by) AS b, by[CAST(j.j AS INT)] AS v
        |      FROM c, LATERAL unnest(range(1, len(by) + 1)) AS j(j)),
        |bs AS (SELECT doc_id, any_value(n) AS n, b, sum(v) AS bsum, count(*) AS blen
        |       FROM e GROUP BY doc_id, b),
        |tot AS (SELECT doc_id, sum(bsum) AS total FROM bs GROUP BY doc_id),
        |ph AS (SELECT bs.doc_id,
        |         CAST(sum(CASE WHEN bsum * n > total * blen
        |                       THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS phash
        |       FROM bs JOIN tot USING (doc_id) GROUP BY bs.doc_id),
        |bd AS (SELECT doc_id, phash, g.b AS b,
        |         (phash >> CAST(g.b * 16 AS INT)) & 65535 AS bv
        |       FROM ph, LATERAL unnest(range(0, 4)) AS g(b)),
        |pr AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
        |         CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
        |       FROM bd x JOIN bd y
        |         ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id)
        |SELECT id_a, id_b, hamming FROM pr WHERE hamming <= 3""".stripMargin,

    // the corpus is ASCII, so octet length == char length and the checksum is
    // the sum of character codes
    "multimodal_meta" ->
      """SELECT doc_id,
        |  length(text) AS n_bytes,
        |  32 + length(text) % 600 AS width,
        |  32 + (length(text) * 7) % 400 AS height,
        |  length(text) // 64 + 1 AS n_frames,
        |  (length(text) // 64 + 1 + 3) // 4 AS n_sampled_frames,
        |  CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS BIGINT) % 997 AS checksum
        |FROM documents""".stripMargin,
    // frame geometry mirrors decodeStub's n_frames (length//64 + 1, so an
    // exact-multiple payload has one empty trailing frame — checksum 0)
    "multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    unnest(generate_series(0, length(text) // 64, 4)) AS fi
        |  FROM documents)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(greatest(0, least(fi * 64 + 64, n) - fi * 64) AS INT) AS n_bytes,
        |  CAST(COALESCE(list_sum(list_transform(
        |    string_split(text[fi * 64 + 1 : least(fi * 64 + 64, n)], ''),
        |    c -> ascii(c))), 0) AS BIGINT) % 997 AS checksum
        |FROM f""".stripMargin,
    // 256×128 → max(1, 256·128/64) = 512 bytes, zero-padded (pad adds 0 to
    // the byte-sum checksum)
    "multimodal_resize" ->
      """SELECT doc_id, CAST(0 AS INT) AS pass, CAST(512 AS INT) AS n_bytes,
        |  CAST(COALESCE(list_sum(list_transform(
        |    string_split(text[1 : least(512, length(text))], ''),
        |    c -> ascii(c))), 0) AS BIGINT) % 997 AS checksum
        |FROM documents""".stripMargin,
    // float32 round-trip: REAL cast reproduces the stub's Float precision
    "multimodal_features" ->
      """WITH c AS (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
        |  FROM documents),
        |d AS (SELECT doc_id, (i - 1) % 8 AS dim, ascii(text[i]) AS code FROM c)
        |SELECT doc_id, dim,
        |  CAST(CAST((sum(code) % 1000) / 1000.0 AS REAL) AS DOUBLE) AS v
        |FROM d GROUP BY doc_id, dim""".stripMargin,
  )
}
