package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
  * The decode step itself is a STUB — image/audio codecs are not available
  * in this environment — implemented as a deterministic fake
  * ([[Multimodal.decodeStub]]) so the Spark-side plumbing (schema,
  * partitioning, batch shape, encoder round-trip) is real and oracle-testable
  * while the codec call is swappable.
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
    val h = imageHashes(docs).toDF()
    val banded = h.select(col("doc_id"), col("phash"),
        explode(sequence(lit(0), lit(bands - 1))).as("b"))
      .withColumn("bv", expr(s"shiftright(phash, CAST(b * $width AS INT)) & 65535"))
    banded.as("x").join(banded.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  val queries: Map[String, Q] = Map(
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
