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
