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

  /** Apply trained merges to a text column: per-word character split, the
    * merge list replayed in order (narrow per-row rewrite — the tokenizer's
    * ENCODE step, distributable over any corpus). */
  def encode(df: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val words = col("__words")
    val tokenized = merges.foldLeft(
        transform(words, wd => split(wd, "")): Column) {
      case (acc, (a, b)) => transform(acc, s => mergePass(s, a, b))
    }
    df.withColumn("__words", split(col("text"), " "))
      .withColumn("bpe_tokens", flatten(tokenized))
      .drop("__words")
  }
}
