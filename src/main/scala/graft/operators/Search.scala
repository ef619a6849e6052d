package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword relevance ranking over a document corpus — the retrieval
  * primitive a curation pipeline uses to pull topical slices out of a
  * crawl (engine extension; the reference has no search surface).
  *
  * Scoring is TF-IDF shaped but kept in INTEGER arithmetic end to end:
  * `score(d) = Σ_t tf(t,d) · W(t)` with `W(t) = (1e6 · N) div df(t)`.
  * A float idf (log-based) would hang cross-engine determinism on
  * `log()` rounding, which IEEE does not require to be correctly
  * rounded (unlike `sqrt`/`div`); integer weights make every engine
  * agree bit-for-bit and preserve the ranking property that rare terms
  * dominate (W is inversely proportional to document frequency).
  *
  * Shape at scale: one shuffle for per-(doc,term) counts — the token
  * explode is filtered by the literal term list BEFORE the shuffle, so
  * only query-term hits move; df(t) is |terms| rows, broadcast back;
  * the final top-k is orderBy+limit → TakeOrderedAndProject (per-
  * partition heaps, no global sort).
  */
object Search {

  /** Top-`k` documents for `queryTerms`, scored by summed integer
    * term weights. Returns (idCol, score) ordered by (score desc, id).
    * `nDocs` is the corpus size used in the weight numerator — pass
    * a pre-computed value, or -1 to count `docs`. */
  def topKByTerms(docs: DataFrame, idCol: String, textCol: String,
                  queryTerms: Seq[String], k: Int,
                  nDocs: Long = -1L): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val n = if (nDocs >= 0) nDocs else docs.count()
    val tf = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // df(t) = number of docs containing t = rows per token in `tf`.
    // Integer `div`, not `/`: Spark's `/` on longs routes through
    // DOUBLE division, which misrounds once the numerator passes 2^53.
    val weights = tf.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .select(col("token"),
        expr(s"${1000000L * n}L div df").as("wt"))
    tf.join(broadcast(weights), "token")
      .groupBy(col(idCol))
      .agg(sum(col("tf") * col("wt")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** BM25-shaped top-`k` ranking — [[topKByTerms]]' integer-weight idf
    * plus BM25's two refinements: TF SATURATION (score grows
    * sublinearly in tf, capped at k1+1) and LENGTH NORMALIZATION (long
    * documents don't win by volume), at the standard k1=1.2, b=0.75.
    *
    * Determinism contract: the tf part is exact rational — with
    * k1=6/5, b=3/4, multiplying through by 10·T gives
    * tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl)) = 22·tf·T / (10·T·tf + 3·T +
    * 9·dl·N), all int64 — and the idf is the scaled-integer Robertson
    * ratio (2(N−df)+1)/(2df+1) (the argument of BM25's log; log-free
    * because IEEE does not require correctly-rounded log, and a
    * monotone substitute ranks identically for a single term).
    *
    * MULTI-term caveat, stated plainly: across terms the substitution
    * is NOT rank-equivalent to true BM25 — the ratio grows linearly in
    * N/df where the log grows logarithmically, so rare terms weigh
    * more here than under textbook BM25 and summed multi-term rankings
    * can diverge from it. This is a deliberate trade: a deterministic,
    * engine-portable ranking (rare-term-favoring is itself a sane
    * retrieval policy) over bit-exact parity with log-BM25. Callers
    * needing textbook ordering should apply log idf and accept
    * float-aggregation nondeterminism across engines. Doubles
    * appear only in one correctly-rounded division and one multiply
    * per (doc, term), and the per-document total is a FIXED-ORDER
    * left-associated chain over per-term conditional sums — never an
    * order-undefined float aggregate.
    *
    * Shape: explode filtered by the literal term list BEFORE the
    * (doc, term) shuffle; df and corpus stats broadcast back; top-k is
    * TakeOrderedAndProject. int64 bounds: W ≤ 2e6·N/df and the tf
    * numerator 22·tf·T — fine to ~10^8-doc corpora; shard the stats
    * beyond that. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val stats = docs.agg(count(lit(1)).as("_n"),
      sum(size(split(col(textCol), " ")).cast("long")).as("_t"))
    val tok = docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("dl"),
      explode(split(col(textCol), " ")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfs = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfs), "token")
      .crossJoin(broadcast(stats))
      .withColumn("wt",
        expr("(1000000 * (2 * (_n - df) + 1)) div (2 * df + 1)"))
      .withColumn("s", col("wt").cast("double") *
        ((lit(22L) * col("tf") * col("_t")).cast("double") /
          (lit(10L) * col("_t") * col("tf") + lit(3L) * col("_t") +
            lit(9L) * col("dl") * col("_n")).cast("double")))
    // per-term conditional sums (each doc has ≤1 row per term; adding
    // exact 0.0 is order-free), then a fixed left-assoc total
    val perTerm = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("s")).otherwise(lit(0.0))).as(s"s$i")
    }
    scored.groupBy(col(idCol))
      .agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score",
        queryTerms.indices.map(i => col(s"s$i")).reduce(_ + _))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** RECIPROCAL-RANK FUSION (Cormack/Clarke/Buettcher, SIGIR 2009) —
    * merge N independent rankings of the same (query, candidate) space
    * into one hybrid ranking: score(q, d) = Σ_lists 1/(k0 + rank).
    * This is the standard hybrid-search combiner (lexical BM25 +
    * dense-vector lists, or dot + L2 views of one index): it needs no
    * score calibration because it only consumes RANKS, which is also
    * what makes it deterministic here — the engine's score is the
    * integer Σ 1000000 div (k0 + rank) (exact, order-free aggregate;
    * the float 1/(k0+r) is monotone-equivalent per list but its SUM
    * depends on addition order, which a distributed aggregate must not).
    *
    * Scale shape: inputs are already top-k lists (|Q|·k rows, metadata
    * scale, not corpus scale); one union + one (query, id) aggregate +
    * one per-query window top-k. A candidate missing from a list simply
    * contributes nothing (the paper's convention). `n_lists` is kept in
    * the output — a fused hit found by every ranker is qualitatively
    * different from a single-list outlier, and re-ranking layers
    * routinely gate on it.
    *
    * Returns (queryCol, rank, idCol, rrf, n_lists), rank 1..topK by
    * (rrf desc, n_lists desc, id). */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
              rankCol: String, k0: Int, topK: Int): DataFrame = {
    require(rankings.size >= 2, "fusion needs at least two rankings")
    require(k0 >= 1, "k0 must be positive (the paper uses 60)")
    val contrib = rankings
      .map(_.select(col(queryCol), col(idCol),
        expr(s"1000000L div (${k0}L + cast($rankCol as bigint))").as("_c")))
      .reduce(_ unionAll _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(queryCol)
      .orderBy(col("rrf").desc, col("n_lists").desc, col(idCol))
    contrib.groupBy(col(queryCol), col(idCol))
      .agg(sum(col("_c")).as("rrf"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col("rank"), col(idCol), col("rrf"),
        col("n_lists"))
  }

  /** DOMAIN FINGERPRINTING: the top-`k` most DISTINCTIVE tokens per
    * group — tokens frequent in this group and rare across groups,
    * scored `tf(t, g) · W(t)` with the integer idf
    * `W(t) = 1e6·|groups| div groupDf(t)` ([[topKByTerms]]'s weight
    * over GROUP document-frequency). This is how a curation pipeline
    * characterizes what each source actually contains (crawl-source
    * drift, "what is this new feed about") without reading any of it.
    *
    * Shape: one (group, token) count aggregate (map-side combinable),
    * a token-level groupDf aggregate broadcast back, and a per-group
    * top-k window filter (WindowGroupLimit — per-partition heaps).
    * `minLen` drops short stopword-ish tokens cheaply BEFORE the first
    * shuffle; idf already buries what survives. Returns
    * (group, token, tf, group_df, score, rnk), rnk 1..k by
    * (score desc, token). */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int, minLen: Int): DataFrame = {
    require(k >= 1, "need k >= 1")
    val tf = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) >= minLen)
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    // countDistinct, not distinct().count(): drops a NULL group like
    // SQL COUNT(DISTINCT) does, so the idf numerator agrees with any
    // SQL mirror even on NULL-bearing group columns
    val nGroups = docs.agg(countDistinct(col(groupCol)).as("_ng"))
    val gdf = tf.groupBy("token").agg(count(lit(1)).as("group_df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(gdf), "token")
      .crossJoin(broadcast(nGroups))
      .withColumn("score",
        expr("tf * ((1000000L * _ng) div group_df)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(groupCol), col("token"), col("tf"), col("group_df"),
        col("score"), col("rnk"))
  }

  /** POSITIONAL PHRASE SEARCH: documents containing the exact token
    * sequence `phrase`, with the number of occurrences — the positional-
    * inverted-index query ("match these words ADJACENT, in order") that
    * bag-of-words scoring ([[topKByTerms]]/[[bm25TopK]]) cannot express.
    *
    * Plan shape: postings (doc, term, pos) are generated and filtered to
    * the phrase's terms BEFORE anything shuffles — only hits for the
    * |phrase| query terms ever move, the corpus-scale token stream never
    * does. Adjacency is then |phrase|−1 equi-joins on (doc, start
    * position): posting lists for term i are rebased to `pos − i`, so a
    * phrase start is a key present in every rebased list — each join is
    * co-partitioned on the same key after the first shuffle (exchange
    * reuse), and term selectivity keeps every input metadata-sized at
    * 100 TB. Final top-k is TakeOrderedAndProject.
    *
    * Returns (idCol, n_matches), top `k` by (n_matches desc, id). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String], k: Int): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two tokens")
    val postings = docs
      .select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.distinct: _*))
    val starts = phrase.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("p0"))
    }.reduce(_.join(_, Seq(idCol, "p0")))
    starts.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col(idCol))
      .limit(k)
  }

  /** Inverted index: one row per surviving token with document
    * frequency, collection frequency, and the sorted posting list
    * (comma-joined ids — a deterministic, engine-portable encoding).
    *
    * `minDf`/`maxDf` bound the posting lists: minDf drops hapax noise,
    * maxDf drops stopword-like tokens whose lists would otherwise grow
    * with the corpus — the classic index-time guard that keeps the
    * per-token `collect_list` bounded at 100 TB (a production index
    * would also shard postings beyond maxDf rather than drop, but the
    * bound is what makes the single-aggregate shape safe). Two
    * shuffles: (token, doc) counts, then per-token fold. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxDf: Long): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"need 1 <= minDf <= maxDf")
    val tf = docs
      .select(explode(split(col(textCol), " ")).as("token"), col(idCol))
      .filter(col("token") =!= "")
      .groupBy(col("token"), col(idCol))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy("token")
      .agg(count(lit(1)).as("df"),
        sum("tf").as("cf"),
        array_join(
          transform(array_sort(collect_list(col(idCol))),
            _.cast("string")), ",").as("postings"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
  }
}
