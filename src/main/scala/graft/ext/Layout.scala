package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** Data-layout operators: Z-order (Morton) clustering for multi-dimensional
  * scan locality. At 100 TB the scan cost of "user 42's events last week"
  * is set by LAYOUT, not compute: parquet prunes row groups by min/max
  * stats, and a single-column sort gives locality in one dimension only —
  * a time-sliced query still touches every file. Interleaving the bits of
  * both dimensions into one sort key keeps rows close in EITHER dimension
  * close on disk, so min/max pruning works for both query shapes at once
  * (the Delta/Iceberg OPTIMIZE ZORDER design, done here as a plain
  * DataFrame transform: range-partition + sort by the Morton key, then
  * write).
  *
  * The key is pure integer bit arithmetic — codegen'd Spark expressions,
  * bit-identical in the DuckDB oracle — and the layout job is one range
  * exchange (sampled bounds) + per-partition sort: the same cost as any
  * global sort, amortized over every future scan. */
object Layout {
  private type Q = (SparkSession, String) => DataFrame

  /** Morton (Z-order) interleave of the low `bits` bits of two non-negative
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * 16+16 bits fill 32 — plenty of resolution for file-level clustering
    * (pruning needs neighborhoods, not total order).
    *
    * PRECONDITION: both inputs already span [0, 2^bits) REASONABLY
    * UNIFORMLY — interleave raw values with very different effective ranges
    * and the wider dimension owns every high bit, degenerating the curve to
    * a single-column sort (measured in LayoutSpec: 15 users × 720 hours
    * raw-interleaved gave ZERO user-dimension pruning). Use [[normalize]]
    * (the Delta/Iceberg OPTIMIZE ZORDER posture: each column is scaled to
    * the key domain first). */
  def mortonKey(a: Column, b: Column, bits: Int = 16): Column =
    mortonKeyN(Seq(a, b), bits)

  /** N-dimensional Morton interleave (the Delta/Iceberg multi-column
    * ZORDER shape): bit i of dimension j lands at position i·d + j.
    * `d · bits` must stay under 63; lower per-dimension resolution with
    * more dimensions is the right trade — pruning needs neighborhoods,
    * not total order. */
  def mortonKeyN(cols: Seq[Column], bits: Int = 16): Column = {
    val d = cols.size
    require(d >= 1 && d * bits < 63, s"$d dims x $bits bits overflow the key")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (k, (c, j)) =>
        k.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + j))
      }
    }
  }

  /** Min-max scale a non-negative column to [0, 2^bits): floor((v − lo) ·
    * 2^bits / (hi − lo + 1)). The floor-of-double-division equals exact
    * integer floor division here: numerator < 2^32 and denominator ≤ 2^32
    * are both exact doubles, and a nearest-rounding of the quotient can
    * only cross an integer boundary if the true remainder fraction
    * (≥ 2^-32) were below a half-ulp (≈ 2^-37 at 2^16) — impossible, so the
    * key is bit-identical to the oracle's `//`. */
  def normalize(v: Column, lo: Column, hi: Column, bits: Int = 16): Column =
    floor(((v - lo) * lit(1L << bits)) / (hi - lo + lit(1L))).cast("long")

  /** Cluster `df` for two-dimensional locality: min-max-normalize both
    * dimensions (one tiny stats aggregate — a layout job is offline, the
    * extra pass is amortized over every future scan), range-partition on
    * the Morton key into `numPartitions` and sort within each — the
    * write-ready shape (each output file covers a compact Z-curve segment,
    * so its min/max stats are tight in BOTH dimensions). */
  def zorderBy(df: DataFrame, a: Column, b: Column,
               numPartitions: Int, bits: Int = 16): DataFrame = {
    val st = df.agg(min(a).as("__alo"), max(a).as("__ahi"),
      min(b).as("__blo"), max(b).as("__bhi"))
    val keyed = df.crossJoin(broadcast(st))
      .withColumn("__z", mortonKey(
        normalize(a, col("__alo"), col("__ahi"), bits),
        normalize(b, col("__blo"), col("__bhi"), bits), bits))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__alo", "__ahi", "__blo", "__bhi")
  }

  /** Bucketed co-located layout for a RECURRING equi-join: write both
    * sides `bucketBy(n, keys)` (sorted within buckets), and every later
    * join on those keys reads with ZERO exchanges — the bucket layout
    * satisfies the join's hash-partitioning requirement at scan time.
    * "Pay the shuffle once at write time" is the standard answer for the
    * fact-to-fact joins of a 100 TB warehouse (dimension joins broadcast;
    * fact joins re-shuffle both sides on EVERY query unless the layout
    * carries the partitioning). Both sides must use the same bucket count.
    *
    * `path`-anchored external table: works against the in-memory catalog
    * (tests) and any metastore alike. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Partition count that compacts `df` into files near `targetBytes`,
    * from the relation's own statistics (for a parquet source: actual
    * on-disk bytes — re-encoded output lands in the same ballpark). The
    * small-files problem is THE operational failure mode of long-lived
    * 100 TB tables: a thousand streaming micro-batches × 32 partitions
    * each = tiny files that destroy scan throughput and metastore
    * listing; periodic `df.repartition(compactionPartitions(df, 512 MB))`
    * rewrites are the maintenance loop every table format schedules. */
  def compactionPartitions(df: DataFrame, targetBytes: Long): Int = {
    require(targetBytes > 0)
    val total = df.queryExecution.optimizedPlan.stats.sizeInBytes
    ((total + targetBytes - 1) / targetBytes).max(1).min(1 << 20).toInt
  }

  /** `df` repartitioned for a near-`targetBytes`-per-file rewrite. */
  def compacted(df: DataFrame, targetBytes: Long): DataFrame =
    df.repartition(compactionPartitions(df, targetBytes))

  /** Compaction PLAN over a file listing: assign each small file to a
    * rewrite bin of ~`targetBytes`, contiguous in (partition, file-id)
    * order — the driver table for the rewrite jobs a table-format
    * OPTIMIZE pass schedules (each bin = one output file; contiguity in
    * id order preserves any existing range-clustering through the
    * rewrite). The sequential-fill rule `bin = exclusive-cumulative-bytes
    * div target` is exact and deterministic; an oversized file owns its
    * bin's span alone.
    *
    * Scale shape: the cumulation windows WITHIN each table partition
    * (parallel across partitions), so the bound is files-per-partition —
    * the quantity the small-files problem is itself measured in (a
    * partition listing that cannot sit in one task's memory has already
    * broken the metastore). A cross-partition global plan would chain
    * this through the two-phase prefix sum ([[Quality]] `rangeCumCounts`). */
  def compactionPlan(files: DataFrame, part: Column, fileId: Column,
                     bytes: Column, targetBytes: Long): DataFrame = {
    require(targetBytes > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy(col("file_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files.select(part.as("part"), fileId.as("file_id"), bytes.as("bytes"))
      .withColumn("bin",
        floor(coalesce(sum(col("bytes")).over(w), lit(0L)) / targetBytes)
          .cast("long"))
  }

  /** The gate's two dimensions over `events`: user and hour-of-stream,
    * both masked to 16 bits. */
  private def dims(e: DataFrame): (Column, Column) = (
    pmod(col("user_id"), lit(65536L)),
    pmod(floor(unix_micros(col("ts")) / lit(3600000000L)), lit(65536L)))

  val queries: Map[String, Q] = Map(
    "zorder_key" -> ((s, dir) => {
      val e = SparkEntry.table(s, dir, "events")
      val (a, b) = dims(e)
      val d = e.select(col("event_id"), a.as("a"), b.as("b"))
      val st = d.agg(min(col("a")).as("alo"), max(col("a")).as("ahi"),
        min(col("b")).as("blo"), max(col("b")).as("bhi"))
      d.crossJoin(broadcast(st))
        .select(col("event_id"), mortonKey(
          normalize(col("a"), col("alo"), col("ahi")),
          normalize(col("b"), col("blo"), col("bhi"))).as("zkey"))
    }),
    // compact each source's per-doc "files" (bytes ~ n_chars) into 100 KB
    // rewrite bins, contiguous in doc_id order
    "compaction_plan" -> ((s, dir) =>
      compactionPlan(SparkEntry.table(s, dir, "documents"),
        col("source"), col("doc_id"), col("n_chars"), 100000L)),
    // 3-dimensional key at 10 bits/dim (user × hour × value-cents): the
    // multi-column OPTIMIZE ZORDER shape
    "zorder_key3" -> ((s, dir) => {
      val e = SparkEntry.table(s, dir, "events")
      val d = e.select(col("event_id"),
        pmod(col("user_id"), lit(1024L)).as("a"),
        pmod(floor(unix_micros(col("ts")) / lit(3600000000L)), lit(1024L)).as("b"),
        pmod(round(col("value") * 100).cast("long"), lit(1024L)).as("c"))
      val st = d.agg(
        min(col("a")).as("alo"), max(col("a")).as("ahi"),
        min(col("b")).as("blo"), max(col("b")).as("bhi"),
        min(col("c")).as("clo"), max(col("c")).as("chi"))
      d.crossJoin(broadcast(st))
        .select(col("event_id"), mortonKeyN(Seq(
          normalize(col("a"), col("alo"), col("ahi"), 10),
          normalize(col("b"), col("blo"), col("bhi"), 10),
          normalize(col("c"), col("clo"), col("chi"), 10)), 10).as("zkey"))
    }),
  )

  /** The same interleave as SQL arithmetic, generated from one loop so the
    * two dialects cannot drift term-by-term. */
  private def mortonSql(a: String, b: String, bits: Int = 16): String =
    mortonSqlN(Seq(a, b), bits)

  private def mortonSqlN(names: Seq[String], bits: Int = 16): String = {
    val d = names.size
    (0 until bits).flatMap(i => names.zipWithIndex.map { case (nm, j) =>
      s"((($nm >> $i) & 1) << ${i * d + j})"
    }).mkString(" | ")
  }

  val oracleSql: Map[String, String] = Map(
    "compaction_plan" ->
      """SELECT source AS part, doc_id AS file_id, n_chars AS bytes,
        |  CAST(COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    // 100000 AS BIGINT) AS bin
        |FROM documents""".stripMargin,
    "zorder_key" ->
      s"""WITH e AS (
        |  SELECT event_id,
        |    user_id % 65536 AS a,
        |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 65536 AS b
        |  FROM events),
        |st AS (SELECT min(a) AS alo, max(a) AS ahi,
        |              min(b) AS blo, max(b) AS bhi FROM e),
        |n AS (SELECT event_id,
        |        ((a - alo) * 65536) // (ahi - alo + 1) AS na,
        |        ((b - blo) * 65536) // (bhi - blo + 1) AS nb
        |      FROM e, st)
        |SELECT event_id, ${mortonSql("na", "nb")} AS zkey FROM n""".stripMargin,
    "zorder_key3" ->
      s"""WITH e AS (
        |  SELECT event_id,
        |    ((user_id % 1024) + 1024) % 1024 AS a,
        |    ((CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 1024) + 1024) % 1024 AS b,
        |    ((CAST(round(value * 100) AS BIGINT) % 1024) + 1024) % 1024 AS c
        |  FROM events),
        |st AS (SELECT min(a) AS alo, max(a) AS ahi, min(b) AS blo, max(b) AS bhi,
        |              min(c) AS clo, max(c) AS chi FROM e),
        |n AS (SELECT event_id,
        |        ((a - alo) * 1024) // (ahi - alo + 1) AS na,
        |        ((b - blo) * 1024) // (bhi - blo + 1) AS nb,
        |        ((c - clo) * 1024) // (chi - clo + 1) AS nc
        |      FROM e, st)
        |SELECT event_id, ${mortonSqlN(Seq("na", "nb", "nc"), 10)} AS zkey FROM n""".stripMargin,
  )
}
