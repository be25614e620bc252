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

  // ---------------------------------------------------------------- WordPiece
  /** WordPiece merge induction — the BERT-family trainer, completing the
    * three standard subword algorithms (BPE q145, unigram q152): identical
    * round loop to `train`, but the argmax maximizes the likelihood ratio
    * score(a,b) = count(ab) / (count(a)·count(b)) instead of the raw pair
    * frequency (Schuster & Nakajima 2012). Counts are exact weighted longs
    * over the CURRENT segmentation (so a merged token's own count feeds
    * later rounds); the ratio is evaluated in double with a (score DESC,
    * l ASC, r ASC) total-order tie-break, so the learned table is
    * partition-independent like BPE's.
    *
    * Scale shape per round: one pair-count shuffle + one symbol-count
    * shuffle (both O(|word vocab|), partial-aggregated). The symbol table
    * is vocabulary-bounded, so it comes back to the driver and enters the
    * score expression as a map literal — the same bounded-collect class as
    * the BPE argmax (a broadcast join is the equivalent shape if the live
    * vocab outgrows a literal; an earlier two-broadcast-join form spent
    * 7.6 s at sf0.1 on per-round join-build jobs vs 3.6 s for this).
    * Score factors are multiplied as doubles — a long product of two
    * corpus-scale counts would overflow. Then a TakeOrdered(1) driver
    * reduction and the same map-only merge fold as BPE. */
  final case class WpMerge(rank: Int, left: String, right: String,
                           merged: String, score: Double)

  def trainWordPiece(spark: SparkSession, wordCounts: DataFrame, rounds: Int)
      : (Seq[WpMerge], DataFrame) = {
    var cur = wordCounts
      .withColumn("syms", chars(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[WpMerge]
    for (round <- 1 to rounds) {
      import spark.implicits._
      val symMap = cur.select(col("wc"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum("wc").as("ws"))
        .as[(String, Long)].collect().toMap
      val symLit = typedLit(symMap)
      val top = cur
        .filter(size(col("syms")) > 1)
        .select(col("wc"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("wc").as("w"))
        .withColumn("score",
          col("w").cast("double") /
            (element_at(symLit, col("l")).cast("double") *
             element_at(symLit, col("r")).cast("double")))
        .orderBy(desc("score"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val row = top(0)
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        merges += WpMerge(round, l, r, l + r, row.getAs[Double]("score"))
        cur = cur
          .withColumn("syms", mergeAdjacent(col("syms"), l, r))
          .localCheckpoint()
      }
    }
    (merges.result(), cur)
  }

  /** q157 — the learned WordPiece merge table (rank, pair, merged token,
    * likelihood-ratio score at merge time). Score floor-rounded at 1e9 for
    * cross-engine golden stability. */
  def wordPieceMerges(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (merges, _) = trainWordPiece(s, wordCounts(Tables.documents(s, d)), Rounds)
    merges.toDF("merge_rank", "lhs", "rhs", "merged", "score")
      .withColumn("score", floor(col("score") * 1e9 + 0.5) / 1e9)
  }

  /** Greedy longest-match-first WordPiece encode of one word against a
    * vocabulary set (single chars are always present, so every word is
    * encodable; the ##-continuation marker is an output convention we skip
    * — token identity is the same). This is the ACTUAL WordPiece
    * tokenization algorithm, which differs from BPE's merge-order replay:
    * it needs only the final vocab, not the merge sequence. */
  private[graft] def wpEncode(w: String, vocab: Set[String], maxLen: Int): Seq[String] = {
    val out = List.newBuilder[String]
    var i = 0
    while (i < w.length) {
      var l = math.min(maxLen, w.length - i)
      while (l > 1 && !vocab.contains(w.substring(i, i + l))) l -= 1
      out += w.substring(i, i + l)
      i += l
    }
    out.result()
  }

  /** q158 — the WordPiece apply side: train the merge table, take the
    * learned vocabulary (all single chars + merged tokens), encode the
    * corpus with greedy longest-match-first, and report per-source
    * compression — same join shape as q146/q153 (the encode stays on the
    * distinct-word table; the vocab rides a tiny driver set into a
    * map-side typed pass). */
  def wordPieceEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val wc = wordCounts(docs)
    val (merges, _) = trainWordPiece(s, wc, Rounds)
    val merged = merges.map(_.merged)
    val chars0 = wc.select(explode(chars(col("word"))).as("c"))
      .distinct().as[String].collect()
    val vocab = chars0.toSet ++ merged
    val maxLen = (1 +: merged.map(_.length)).max
    val encoded = wc.select(col("word")).as[String]
      .map(w => (w, wpEncode(w, vocab, maxLen).length))
      .toDF("word", "n_wp")
    docs.select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
      .join(encoded, "word")
      .groupBy("source")
      .agg(sum(col("n")).as("n_words"),
           sum(col("n") * length(col("word"))).as("n_chars"),
           sum(col("n") * col("n_wp")).as("n_wp_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_wp_tokens"), 4))
      .select("source", "n_words", "n_chars", "n_wp_tokens", "chars_per_token")
  }

  // ---------------------------------------------------------------- unigram LM
  /** Unigram-LM tokenizer induction (the SentencePiece counterpart to the
    * BPE trainer above; Kudo 2018) via Viterbi hard-EM — the OTHER standard
    * subword algorithm a tokenizer-training pipeline offers. Seed the
    * vocabulary with every ≤ `UniMaxLen`-char substring of the distinct-word
    * table (weighted by word frequency; all single chars + the top
    * `UniTopK` multi-char pieces — the vocab-capacity lever, 10^5–10^6 in a
    * real deployment, scaled down to this corpus), initialize piece
    * probabilities ∝ seed frequency, then alternate: E — per-word Viterbi
    * segmentation under broadcast log-probs; M — re-estimate probabilities
    * from weighted piece usage (single chars keep an add-one floor so
    * coverage never breaks; unused multi-char pieces are pruned, which is
    * the EM-side analogue of SentencePiece's shrinking step).
    *
    * Scale shape mirrors `train`: the corpus is scanned once into the
    * distinct-word table (localCheckpoint'd — every later pass is
    * O(|vocab words|), not O(corpus)); each round is one map-side typed
    * Viterbi pass (per-word DP is genuinely imperative — the documented
    * Dataset-map exception, like kmeans' assignment) + one partial-agg
    * shuffle of (piece, weight) + a vocab-sized driver collect (the same
    * bounded-collect class as the BPE argmax and k-means centroids; a 10^6
    * vocab broadcasts at ~tens of MB). Viterbi-EM rather than full
    * forward-backward: hard-EM is the standard simplification and keeps
    * every statistic an exact integer sum, so the learned table is
    * partition-independent (TokenizerSpec re-derives it in plain Scala and
    * under a different layout).
    *
    * Determinism: seed counts and usage counts are exact longs; probability
    * ratios and per-word DP depend only on those — never on partition
    * layout. Viterbi ties break toward the LONGEST piece (candidate starts
    * scan ascending, strict > replacement), a total order. */
  val UniMaxLen = 4
  val UniTopK = 80
  val UniRounds = 2

  /** Viterbi best segmentation of `w` under piece log-probs; single chars
    * are always in vocab, so every word is segmentable. */
  private[llm] def viterbi(w: String, logp: collection.Map[String, Double],
                           maxLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var start = math.max(0, end - maxLen)
      while (start < end) {
        logp.get(w.substring(start, end)) match {
          case Some(lp) if best(start) + lp > best(end) =>
            best(end) = best(start) + lp
            back(end) = start
          case _ => ()
        }
        start += 1
      }
      end += 1
    }
    val rev = scala.collection.mutable.ListBuffer.empty[String]
    var e = n
    while (e > 0) { val st = back(e); w.substring(st, e) +=: rev; e = st }
    rev.toList
  }

  /** Learn the unigram vocabulary from a (word, wc) frequency table;
    * returns final piece probabilities and the final per-word segmentation
    * (word, wc, pieces). */
  def unigramTrain(s: SparkSession, wordCounts: DataFrame,
                   maxLen: Int = UniMaxLen, topK: Int = UniTopK,
                   rounds: Int = UniRounds)
      : (Map[String, Double], DataFrame) = {
    import s.implicits._
    val words = wordCounts.select(col("word"), col("wc"))
      .as[(String, Long)].localCheckpoint()
    val seeds = words.flatMap { case (w, c) =>
      for { i <- 0 until w.length
            l <- 1 to math.min(maxLen, w.length - i) }
        yield (w.substring(i, i + l), c)
    }.toDF("piece", "c").groupBy("piece").agg(sum("c").as("freq"))
    val seedRows =
      seeds.filter(length(col("piece")) === 1).as[(String, Long)].collect() ++
      seeds.filter(length(col("piece")) > 1)
        .orderBy(desc("freq"), asc("piece")).limit(topK)
        .as[(String, Long)].collect()
    val seedTotal = seedRows.map(_._2).sum.toDouble
    var probs: Map[String, Double] =
      seedRows.map { case (p, f) => p -> f / seedTotal }.toMap
    for (_ <- 1 to rounds) {
      val logp = probs.map { case (k, v) => k -> math.log(v) }
      val ml = maxLen
      val usage = words
        .flatMap { case (w, c) => viterbi(w, logp, ml).map(p => (p, c)) }
        .toDF("piece", "c").groupBy("piece").agg(sum("c").as("u"))
        .as[(String, Long)].collect().toMap
      val kept = probs.keysIterator.map { p =>
        val u = usage.getOrElse(p, 0L)
        p -> (if (p.length == 1) u + 1 else u)
      }.filter(_._2 > 0).toSeq
      val tot = kept.map(_._2).sum.toDouble
      probs = kept.map { case (p, u) => p -> u / tot }.toMap
    }
    val logpF = probs.map { case (k, v) => k -> math.log(v) }
    val ml = maxLen
    val segmented = words
      .map { case (w, c) => (w, c, viterbi(w, logpF, ml)) }
      .toDF("word", "wc", "pieces")
    (probs, segmented)
  }

  /** q152 — the learned unigram vocabulary (piece, final probability,
    * weighted corpus uses under the final Viterbi segmentation) — the
    * artifact a SentencePiece-style training job ships. */
  def unigramVocab(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (probs, seg) = unigramTrain(s, wordCounts(Tables.documents(s, d)))
    val probDf = probs.toSeq.toDF("piece", "p")
    seg.select(explode(col("pieces")).as("piece"), col("wc"))
      .groupBy("piece").agg(sum("wc").as("n_uses"))
      .join(broadcast(probDf), Seq("piece"), "right")
      .select(col("piece"),
        coalesce(col("n_uses"), lit(0L)).as("n_uses"),
        // floor-spelled rounding (wordEntropy contract); 1e6 keeps 3-4
        // significant digits at these piece probabilities
        (floor(col("p") * 1000000 + 0.5) / 1000000.0).as("prob"))
  }

  /** q153 — the apply side: encode the corpus with the learned unigram
    * vocab and report per-source compression, same join shape as q146
    * (the encode stays on the distinct-word table). */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (_, seg) = unigramTrain(s, wordCounts(docs))
    docs.select(col("source"), explode(tokens(col("text"))).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("n"))
      .join(seg.select("word", "pieces"), "word")
      .groupBy("source")
      .agg(sum(col("n")).as("n_words"),
           sum(col("n") * length(col("word"))).as("n_chars"),
           sum(col("n") * size(col("pieces"))).as("n_uni_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / col("n_uni_tokens"), 4))
      .select("source", "n_words", "n_chars", "n_uni_tokens", "chars_per_token")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q145_bpe_merges", bpeMerges _,
      Some(graft.core.Goldens.load("q145_bpe_merges"))),
    GraftQuery("q146_bpe_encode", bpeEncode _,
      Some(graft.core.Goldens.load("q146_bpe_encode"))),
    GraftQuery("q152_unigram_vocab", unigramVocab _,
      Some(graft.core.Goldens.load("q152_unigram_vocab"))),
    GraftQuery("q153_unigram_encode", unigramEncode _,
      Some(graft.core.Goldens.load("q153_unigram_encode"))),
    GraftQuery("q157_wordpiece_merges", wordPieceMerges _,
      Some(graft.core.Goldens.load("q157_wordpiece_merges"))),
    GraftQuery("q158_wordpiece_encode", wordPieceEncode _,
      Some(graft.core.Goldens.load("q158_wordpiece_encode"))))
}
