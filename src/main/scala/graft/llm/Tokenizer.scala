package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.GraftQuery

/** Distributed BPE tokenizer induction — the missing piece between the
  * token-counting / vocabulary queries (q31, q100, q140) and the packing
  * stage (q115, q144): LEARN the subword vocabulary from the corpus
  * instead of assuming whitespace tokens.
  *
  * Scale shape (the standard distributed-BPE reduction, cf. the
  * SentencePiece/HuggingFace trainers): the corpus is scanned ONCE to
  * build the distinct-word frequency table, and every merge round then
  * iterates over that table — O(|vocab|) rows, not O(corpus). Per round:
  * one partial-aggregated shuffle (adjacent-pair counts weighted by word
  * frequency), one TakeOrdered(1) to the driver (the argmax pair — a few
  * bytes, the same driver-side reduction k-means uses for centroids), and
  * one map-only fold that applies the merge to each word's symbol array.
  * `localCheckpoint` after every round caps lineage exactly like
  * `Similarity.kmeansTrain`. At 100 TB the word table is ~10^8 rows — each
  * round is a small shuffle, and nothing per-corpus-row ever iterates.
  *
  * Determinism (the golden-oracle contract, q59/q126 style): pair counts
  * are exact integers and the argmax tie-breaks on (count DESC, left ASC,
  * right ASC) — a total order, so the learned merge table is independent
  * of partition layout (TokenizerSpec re-derives it with a plain-Scala
  * reference and under a different partitioning).
  */
object Tokenizer {

  /** Merge rounds learned by q145/q146. Enough to produce multi-character
    * subwords on the synthetic corpus without degenerating to whole-word
    * memorization of its small vocabulary. */
  val Rounds = 10

  private def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** One learned merge: rank is 1-based round order, weight the exact
    * weighted pair count at merge time. */
  final case class BpeMerge(rank: Int, left: String, right: String,
                            merged: String, weight: Long)

  /** Characters of a word as an array<string> — explicit substring walk
    * (split-on-empty-regex edge behavior differs across engines). */
  private def chars(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** Adjacent symbol pairs as structs {l, r}; callers filter size > 1
    * first (sequence() would run DESCENDING for an empty range). */
  private def adjacentPairs(syms: Column): Column =
    transform(sequence(lit(1), size(syms) - 1),
      i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r")))

  /** Greedy leftmost application of one merge (l, r) -> l+r over a symbol
    * array, as a codegen'd `aggregate` fold: append each symbol unless it
    * completes the pair with the accumulator's last element, in which case
    * the pair is replaced by the merged token. The fold's left-to-right
    * order gives standard BPE semantics — "aaa" under (a,a) becomes
    * ["aa","a"], and the freshly merged token does NOT re-pair with the
    * next symbol in the same pass. */
  def mergeAdjacent(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn `rounds` BPE merges from a (word, wc) frequency table; returns
    * the merge table and the final per-word segmentation. */
  def train(spark: SparkSession, wordCounts: DataFrame, rounds: Int)
      : (Seq[BpeMerge], DataFrame) = {
    var cur = wordCounts
      .withColumn("syms", chars(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[BpeMerge]
    for (round <- 1 to rounds) {
      val top = cur
        .filter(size(col("syms")) > 1)
        .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("wc").as("w"))
        .orderBy(desc("w"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, w) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(round, l, r, l + r, w)
        cur = cur
          .withColumn("syms", mergeAdjacent(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    (merges.result(), cur)
  }

  /** Corpus-wide distinct-word frequency table — the ONE full scan. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wc"))

  /** q145 — the learned merge table itself (rank, pair, merged token,
    * weighted count), the artifact a tokenizer-training job ships. */
  def bpeMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (merges, _) = train(s, wordCounts(Tables.documents(s, d)), Rounds)
    // lhs/rhs, merge_rank: LEFT/RIGHT/RANK are SQL keywords and the golden
    // oracle names these columns in a DuckDB VALUES alias list
    merges.toDF("merge_rank", "lhs", "rhs", "merged", "weight")
  }

  /** q146 — the apply side: encode the corpus with the learned merges and
    * report per-source compression (chars per BPE token). The encode
    * itself stays on the distinct-word table — the per-source weighting
    * joins word frequencies against the final segmentation, so the corpus
    * text is never re-walked per merge. */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (_, encoded) = train(s, wordCounts(docs), Rounds)
    val bySource = docs
      .select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("wc"))
    bySource.join(encoded.select("word", "syms"), "word")
      .groupBy("source")
      .agg(sum(col("wc")).as("n_words"),
           sum(col("wc") * length(col("word"))).as("n_chars"),
           sum(col("wc") * size(col("syms"))).as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_bpe_tokens"), 4))
      .select("source", "n_words", "n_chars", "n_bpe_tokens", "chars_per_token")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q145_bpe_merges", bpeMerges _,
      Some(graft.core.Goldens.load("q145_bpe_merges"))),
    GraftQuery("q146_bpe_encode", bpeEncode _,
      Some(graft.core.Goldens.load("q146_bpe_encode"))))
}
