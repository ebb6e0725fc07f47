package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE vocabulary induction over a document corpus — the tokenizer-training
  * step of a pretraining pipeline (Sennrich et al. 2016): repeatedly merge
  * the most frequent adjacent symbol pair, starting from characters.
  *
  * Classic word-frequency formulation: the corpus compresses to a
  * `(symbols, freq)` table of DISTINCT words first (one Spark aggregation
  * over the full corpus — the only corpus-sized stage), and every merge
  * iteration then runs on that compact table: adjacent-pair counts weighted
  * by word frequency (explode + sum), deterministic argmax (count desc,
  * pair asc), and a left-to-right non-cascading merge rewrite of the symbol
  * arrays. At 100 TB the distinct-word table is millions of rows — merge
  * iterations cost seconds regardless of corpus size, and the driver only
  * ever holds the single best pair per iteration plus the merge list. */
object Vocab {

  /** Adjacent symbol pairs of a materialized array column, encoded as
    * `a + sep + b` strings (sep = U+0001, never inside a symbol — symbols are concatenations of word characters). */
  private def adjacentPairs(sym: Column): Column =
    when(size(sym) >= 2,
        transform(sequence(lit(1), size(sym) - 1),
          i => concat(element_at(sym, i), lit(Sep), element_at(sym, i + 1))))
      .otherwise(array().cast("array<string>"))

  private val Sep = "\u0001"

  /** One BPE merge pass: replace every LEFT-TO-RIGHT, NON-OVERLAPPING,
    * NON-CASCADING occurrence of adjacent `(a, b)` with the merged symbol
    * (classic single-pass semantics: `aaa` + merge(a,a) → `[aa, a]`, and a
    * symbol created by this pass never re-merges within the pass). */
  private[ext] def mergePass(sym: Column, a: String, b: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"), lit("").as("pend"))
    val step = (s: Column, x: Column) => {
      val merged = s.getField("pend") === a && x === b
      struct(
        when(merged, concat(s.getField("out"), array(lit(a + b))))
          .otherwise(when(s.getField("pend") === "", s.getField("out"))
            .otherwise(concat(s.getField("out"), array(s.getField("pend")))))
          .as("out"),
        when(merged, lit("")).otherwise(x).as("pend"))
    }
    val fin = (s: Column) =>
      when(s.getField("pend") === "", s.getField("out"))
        .otherwise(concat(s.getField("out"), array(s.getField("pend"))))
    aggregate(sym, zero, step, fin)
  }

  /** Train `nMerges` BPE merges; returns them in application order. Stops
    * early when no adjacent pair occurs at least `minPairCount` times.
    * Deterministic: ties broken by pair lexicographic order. */
  def trainBpe(docs: DataFrame, nMerges: Int = 50,
               minPairCount: Long = 2L): Seq[(String, String)] = {
    // the one corpus-sized aggregation: distinct words with frequencies,
    // then each word as its character-symbol array
    // localCheckpoint (not cache): each iteration's rewrite nests another
    // `aggregate` expression into the plan, and 30+ chained rewrites blow
    // the analyzer up (measured OOM); checkpointing truncates the lineage
    // to the materialized partitions while staying distributed
    var freq = docs.select(explode(split(col("text"), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(split(col("word"), "").as("sym"), col("freq"))
      .localCheckpoint(true)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < nMerges) {
      val top = freq
        .select(col("freq"), explode(adjacentPairs(col("sym"))).as("p"))
        .groupBy("p").agg(sum("freq").as("c"))
        .where(col("c") >= minPairCount)
        .orderBy(desc("c"), asc("p"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(Sep, 2)
        merges += ((a, b))
        val next = freq
          .select(mergePass(col("sym"), a, b).as("sym"), col("freq"))
          .localCheckpoint(true)
        freq.unpersist()
        freq = next
      }
    }
    freq.unpersist()
    merges.toSeq
  }

  /** Rank-priority BPE encode of one word: repeatedly merge the
    * lowest-rank adjacent pair present. Equivalent to replaying the merge
    * passes in training order — a later merge's new symbol never creates an
    * adjacency between two OLD symbols (merging only ever removes symbols
    * between neighbors it replaces), so by the time rank k is the minimum
    * present, every lower rank is permanently absent. O(L²) per word in the
    * worst case, independent of vocabulary size. */
  private[ext] def encodeWord(word: String, rank: Map[(String, String), Int],
                              byRank: IndexedSeq[(String, String)]): Seq[String] = {
    var sym = word.split("").toVector
    var done = false
    while (!done && sym.size >= 2) {
      val present = sym.indices.dropRight(1)
        .flatMap(i => rank.get((sym(i), sym(i + 1))))
      if (present.isEmpty) done = true
      else {
        val (a, b) = byRank(present.min)
        // merge ALL occurrences of this pair, left-to-right non-overlapping
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < sym.size) {
          if (i + 1 < sym.size && sym(i) == a && sym(i + 1) == b) {
            out += a + b; i += 2
          } else { out += sym(i); i += 1 }
        }
        sym = out.result()
      }
    }
    sym
  }

  /** Apply trained merges to a text column — the tokenizer's ENCODE step,
    * distributable over any corpus (narrow per-row rewrite; the merge-rank
    * map ships with the closure).
    *
    * Deliberately a closure, not a chained higher-order-function column:
    * one nested `transform`+`aggregate` per merge makes the Catalyst
    * expression tree O(nMerges) deep, and a realistic 32k-merge vocabulary
    * dies in the analyzer before touching a row (the same lineage blowup
    * [[trainBpe]] checkpoints away per iteration). Rank-priority encoding
    * is also O(L²) per word regardless of vocabulary size, where replaying
    * 32k merge passes would be O(32k·L). */
  def encode(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val byRank = merges.toIndexedSeq
    val enc = udf { text: String =>
      if (text == null) Seq.empty[String]
      else text.split(" ").toSeq.filter(_.nonEmpty)
        .flatMap(encodeWord(_, rank, byRank))
    }
    df.withColumn("bpe_tokens", enc(col("text")))
  }
}
