package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning — the tokenizer-training step of
  * an LLM data pipeline (engine extension; completes the tokenization
  * story next to [[TextAnalysis.regexTokens]] and
  * [[Curation.vocabulary]]).
  *
  * Classic BPE (Sennrich et al. 2016): start from characters, then
  * repeatedly merge the most frequent adjacent symbol pair. State is
  * kept as a space-delimited symbol STRING per distinct word — not a
  * nested array — because applying a merge is then one engine-portable
  * `replace` chain (see [[applyMerge]]), which is also what lets the
  * DuckDB oracle mirror every iteration exactly.
  *
  * Scale shape: the state table is one row per DISTINCT word (with its
  * corpus frequency) — vocabulary-sized, not corpus-sized. Each merge
  * round is: one explode+sum over adjacent pairs (map-side combinable),
  * an argmax of ONE row collected to the driver (the same k-scalars
  * loop as [[KMeans.lloyd]]), and a narrow per-row replace. Rounds are
  * `numMerges` by construction.
  */
object Bpe {

  /** The merge-application trick: with symbols single-space-delimited
    * and the string wrapped in one space each side, doubling the spaces
    * first makes left-to-right non-overlapping `replace` consume one
    * space from each side of a match — so back-to-back occurrences
    * (" a b a b ") and odd chains (" b b b ") merge exactly as BPE's
    * left-to-right rule demands; normalizing "  "→" " afterwards cannot
    * leave doubles (every gap is ≤2 spaces by construction). */
  def applyMerge(s: org.apache.spark.sql.Column, a: String, b: String)
      : org.apache.spark.sql.Column =
    call_function("replace",
      call_function("replace",
        call_function("replace", s, lit(" "), lit("  ")),
        lit(s" $a  $b "), lit(s" $a$b ")),
      lit("  "), lit(" "))

  /** Learn up to `numMerges` merges over the lowercase-alpha words of
    * `textCol` (the `[a-z]+` filter keeps the contract byte-exact on
    * any engine; real pipelines pre-normalize anyway). Ties break on
    * (count desc, left asc, right asc). Stops early if no pair is left.
    *
    * Returns (merge_rank, left, right, pair_count), one row per merge
    * in learning order. */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    val (mergeDf, vocab) = learn(docs, textCol, numMerges)
    // The merge table is driver-local rows; the vocabulary's final
    // checkpoint would otherwise sit in the block manager forever.
    graft.Checkpoints.free(vocab)
    mergeDf
  }

  /** Tokenize the corpus with merges learned from it: per document, the
    * word count and post-merge symbol count of its lowercase-alpha
    * words. The vocabulary (word → merged symbol string) is
    * vocabulary-sized and joins back to the corpus by word — the same
    * shape a production tokenizer run takes (trained artifact broadcast
    * against the stream of documents). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  numMerges: Int): DataFrame =
    applyVocab(docs, idCol, textCol, learn(docs, textCol, numMerges)._2
      .select(col("w"),
        size(split(trim(col("s")), " ")).cast("long").as("n_sym")))

  /** Tokenize with an ALREADY-TRAINED merge table (the output of
    * [[learnMerges]]) — the production shape: train once, then apply
    * the artifact to any corpus without re-running the learning loop.
    *
    * `merges` is vocabulary-sized by contract (≤64 rows — one per
    * learned merge), so collecting it to the driver is the same
    * k-scalars move as broadcasting a trained model. The per-word
    * vocabulary is rebuilt by folding the merges, in rank order, over
    * the corpus's DISTINCT words — one narrow projection, no iteration
    * over the data, no driver argmax, no checkpoints. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: DataFrame): DataFrame = {
    val ms = merges.orderBy("merge_rank").select("left", "right").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val base = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .distinct()
      .select(col("w"),
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))
          .as("s"))
    val vocab = ms.foldLeft(base) { case (df, (a, b)) =>
      df.select(col("w"), applyMerge(col("s"), a, b).as("s"))
    }.select(col("w"),
      size(split(trim(col("s")), " ")).cast("long").as("n_sym"))
    applyVocab(docs, idCol, textCol, vocab)
  }

  /** Join the (word → post-merge symbol count) vocabulary back to the
    * corpus: the trained artifact broadcasts against the document
    * stream, one shuffle for the per-document aggregate. */
  private def applyVocab(docs: DataFrame, idCol: String, textCol: String,
                         vocab: DataFrame): DataFrame =
    docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .join(broadcast(vocab), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_tokens"))

  /** Shared learning loop: returns (merge table, final word→symbols
    * vocabulary). */
  private def learn(docs: DataFrame, textCol: String,
                    numMerges: Int): (DataFrame, DataFrame) = {
    require(numMerges >= 1 && numMerges <= 64,
      s"numMerges must be in [1, 64], got $numMerges — each merge is a " +
        "distributed round; cap it explicitly rather than looping freely")
    val spark = docs.sparkSession

    var state = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"),
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))
          .as("s"),
        col("freq"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val toks = state.select(col("freq"),
        split(trim(col("s")), " ").as("t"))
      val best = toks
        .select(col("freq"),
          explode(zip_with(col("t"), slice(col("t"), 2, 1 << 30),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .filter(col("p.b").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank.toLong, a, b, cnt))
        val prev = state
        state = state
          .select(col("w"), applyMerge(col("s"), a, b).as("s"), col("freq"))
          .localCheckpoint()
        // eager checkpoint above has materialized the new generation;
        // the superseded one is dead — free it, or `numMerges`
        // generations pile up in the block manager per call
        graft.Checkpoints.free(prev)
        rank += 1
      }
    }
    val mergeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.result().map(m => Row(m._1, m._2, m._3, m._4)), 1),
      StructType(Seq(
        StructField("merge_rank", LongType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))
    (mergeDf, state.select(col("w"), col("s")))
  }
}
