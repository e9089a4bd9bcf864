package graft.llmops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical similarity search — IDF-weighted cosine over term
  * frequency vectors via an inverted index, the retrieval complement to
  * the embedding ANN family ([[Similarity]]) and the set-overlap family
  * ([[Dedup]]): embeddings catch paraphrase, shingles catch near-verbatim
  * copies, and this catches "same document, different boilerplate" —
  * heavy shared vocabulary under reordering, where shingles break and no
  * embedding model is in the loop.
  *
  * Scale shape (the inverted-index contract): candidate volume is
  * Σ_term df(term)², so the df window [2, maxDf] is the operator's knob —
  * df=1 terms match nothing and stopword-grade terms would square into
  * the candidate explosion; dropping them is what makes lexical search
  * tractable at corpus scale (the same role `maxBucket` plays in the LSH
  * families). Everything is one postings groupBy + one term-keyed
  * self-join + one pair groupBy; no row ever carries the document text.
  *
  * Determinism: tf/df are integers; the IDF weight is
  * floor(1e6/df) — exact for df < 10⁸ because the true quotient sits
  * ≥1/df from the nearest integer while the double error is ~1e-10 —
  * so the weighted co-occurrence numerator is an exact long. Float
  * enters in the final cosine only, as the identical operation tree
  * `num / sqrt(double(sa)·double(sb))` in both engines.
  */
object SparseSim {

  /** (id, term, tf) postings from whitespace-tokenized text. */
  def tfPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k IDF-weighted cosine neighbors per document.
    * Output: (id, neighbor, score_num, cosine, rank) — `score_num` is
    * the exact integer numerator, kept for auditability. */
  def cosineTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDf: Long): DataFrame = {
    require(k >= 1 && maxDf >= 2)
    val post = tfPostings(docs, idCol, textCol)
    val df_ = post.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .withColumn("w", floor(lit(1000000.0) / col("df")).cast("long"))
    val wpost = post.join(df_, "term")
    // self-norms over the SAME df-pruned weighted postings the pair
    // scores use — cosine is then exact over the pruned vector space
    val norms = wpost.groupBy("id")
      .agg(sum(col("tf") * col("tf") * col("w")).as("s2"))
    val a = wpost.select(col("term"), col("id").as("id_a"),
      col("tf").as("tf_a"), col("w"))
    val b = wpost.select(col("term"), col("id").as("id_b"),
      col("tf").as("tf_b"))
    val pairs = a.join(b, "term")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("tf_a") * col("tf_b") * col("w")).as("score_num"))
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("neighbor"),
        col("score_num"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("neighbor"),
        col("score_num")))
    val scored = sym
      .join(norms.select(col("id"), col("s2").as("sa")), "id")
      .join(norms.select(col("id").as("neighbor"), col("s2").as("sb")), "neighbor")
      .withColumn("cosine", col("score_num").cast("double")
        / sqrt(col("sa").cast("double") * col("sb").cast("double")))
    val top = Window.partitionBy("id")
      .orderBy(col("cosine").desc, col("neighbor"))
    scored.withColumn("rank", row_number().over(top))
      .filter(col("rank") <= k)
      .select("id", "neighbor", "score_num", "cosine", "rank")
  }
}
