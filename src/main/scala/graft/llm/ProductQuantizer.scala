package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor — the
  * memory-compression path that completes the engine's ANN set (brute
  * force / hyperplane LSH / IVF): vectors are stored as `m` small codes
  * (here 8 subspaces × 4-bit codes = 4 bytes for a 64-dim float vector, a
  * 64× compression), and search scans CODES, not vectors, via asymmetric
  * distance computation (ADC): the query precomputes its dot product with
  * every subspace centroid (m×k table, broadcast), and each candidate's
  * approximate score is m table lookups summed.
  *
  * At 100 TB of embeddings this is the difference between scanning 25 TB
  * of floats and 0.4 TB of codes; the exact re-rank then touches only the
  * shortlist. All vectors are unit-normalized at entry, so approximate
  * inner product ranks by cosine.
  *
  * Training is per-subspace Lloyd's with deterministic hash-rank seeding
  * and DECIMAL-exact centroid means — repeated training on the same data
  * yields bit-identical codebooks under any partitioning (same rule as the
  * engine's money sums).
  */
object ProductQuantizer {

  private def unitVec(vecCol: Column): Column = {
    val v = transform(vecCol, _.cast("double"))
    val n = sqrt(graft.functions.VectorFunctions.vec_dot(v, v))
    transform(v, x => x / n)
  }

  /** (id, sub, sv): unit-normalized vectors sliced into `m` subvectors. */
  private def subvectors(df: DataFrame, idCol: String, vecCol: String, m: Int): DataFrame = {
    val dim = size(col(vecCol))
    val sub = dim / m
    df.select(col(idCol).as("vid"), unitVec(col(vecCol)).as("uv"), sub.as("sw"))
      .select(col("vid"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("uv"), col("sw"))
      .select(col("vid"), col("sub"),
        slice(col("uv"), col("sub") * col("sw") + 1, col("sw")).as("sv"))
  }

  /** Assign each (vid, sub) row to its max-inner-product centroid. */
  private def assign(sv: DataFrame, centroids: DataFrame): DataFrame =
    sv.join(broadcast(centroids), "sub")
      .withColumn("ip", graft.functions.VectorFunctions.vec_dot(col("sv"), col("cv")))
      .groupBy("vid", "sub")
      .agg(max_by(col("code"), struct(col("ip"), -col("code"))).as("code"))

  /** Train per-subspace codebooks: (sub, code, cv). `k` centroids per
    * subspace, seeded by hash rank, refined with `iters` Lloyd's rounds.
    *
    * Training economics at 100 TB: codebooks need thousands of vectors,
    * not the corpus. A deterministic hash-sample (value-keyed threshold —
    * bit-stable under any partitioning) bounds the training set to
    * ~`sampleN` rows, which are COLLECTED and fitted in one tight local
    * loop — the alternative (m×iters rounds of distributed join+agg over
    * a 256-row codebook) costs dozens of near-empty jobs whose scheduling
    * overhead dwarfs the arithmetic at any scale. The collect is bounded
    * by `sampleN × dim` by construction (~10 MB at the defaults), the
    * fit is single-threaded ⇒ bit-deterministic, and the returned
    * codebook is a local relation every downstream join broadcasts for
    * free. Encoding the corpus ([[encode]]) stays fully distributed. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 3, sampleN: Int = 20000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val n = corpus.count()
    val training = if (n <= sampleN) corpus else {
      val den = 1L << 20
      val num = math.max(1L, math.ceil(sampleN.toDouble / n * den).toLong)
      corpus.filter(pmod(xxhash64(col(idCol)), lit(den)) < lit(num))
    }
    // hash-rank order = the seeding rule: seeds are the first k subvectors
    // of each subspace in (xxhash64(id), id) order, exactly reproducible
    val collected = subvectors(training, idCol, vecCol, m)
      .orderBy(xxhash64(col("vid")), col("vid"), col("sub"))
      .select(col("sub"), col("sv"))
      .as[(Int, Seq[Double])]
      .collect()
    val bySub = collected.groupBy(_._1) // groupBy preserves encounter order
    val cents = (0 until m).flatMap { sub =>
      val vecs = bySub.getOrElse(sub, Array.empty[(Int, Seq[Double])]).map(_._2.toArray)
      var cs = vecs.take(k).map(_.clone)
      val kk = cs.length
      (1 to iters).foreach { _ =>
        val sums = Array.fill(kk)(null: Array[Double])
        val cnts = new Array[Long](kk)
        vecs.foreach { v =>
          // max-inner-product assignment; ties → lower code (strict >)
          var best = 0; var bestIp = Double.NegativeInfinity
          var c = 0
          while (c < kk) {
            var ip = 0.0; var i = 0
            while (i < v.length) { ip += v(i) * cs(c)(i); i += 1 }
            if (ip > bestIp) { bestIp = ip; best = c }
            c += 1
          }
          if (sums(best) == null) sums(best) = new Array[Double](v.length)
          var i = 0
          while (i < v.length) { sums(best)(i) += v(i); i += 1 }
          cnts(best) += 1
        }
        // empty clusters keep their previous centroid
        cs = Array.tabulate(kk) { c =>
          if (cnts(c) == 0) cs(c) else sums(c).map(_ / cnts(c))
        }
      }
      cs.zipWithIndex.map { case (cv, code) => (sub, code, cv.toSeq) }
    }
    cents.toDF("sub", "code", "cv")
  }

  /** Encode the corpus against a codebook: (id, sub, code) — m codes per
    * vector, `log2(k)` bits each. */
  def encode(corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, m: Int = 8): DataFrame =
    assign(subvectors(corpus, idCol, vecCol, m), centroids)
      .select(col("vid").as(idCol), col("sub"), col("code"))

  /** ADC top-k: rank candidates by summed table lookups, shortlist
    * `rerank` candidates, exact-rerank with the full vectors. Output
    * (query_id, neighbor_id, score) — score is the EXACT cosine of the
    * reranked shortlist, rounded to 6 places. Self-matches excluded. */
  def adcTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      codes: DataFrame, idCol: String, vecCol: String,
      k: Int, m: Int = 8, rerank: Int = 50): DataFrame = {
    // query → per-(sub, code) partial dot table (m×k rows per query, broadcast)
    val qtab = subvectors(queries, idCol, vecCol, m)
      .withColumnRenamed("vid", "query_id")
      .join(broadcast(centroids), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        graft.functions.VectorFunctions.vec_dot(col("sv"), col("cv")).as("pdot"))
    val approx = codes.join(broadcast(qtab), Seq("sub", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col(idCol).as("neighbor_id"))
      .agg(sum(col("pdot")).as("adc"))
    val shortW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("neighbor_id"))
    val shortlist = approx.withColumn("rk", row_number().over(shortW))
      .filter(col("rk") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank of the shortlist only
    val qv = queries.select(col(idCol).as("query_id"), unitVec(col(vecCol)).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), unitVec(col(vecCol)).as("nv"))
    val exact = shortlist.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("score",
        round(graft.functions.VectorFunctions.vec_dot(col("qv"), col("nv")), 6))
    val topW = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    exact.withColumn("rk", row_number().over(topW)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"))
  }
}
