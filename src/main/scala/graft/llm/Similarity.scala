package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two paths, per the north-star design:
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *    A broadcast-join cross product; right for |queries| ≪ |corpus|.
  *  - [[lshTopK]]: random-hyperplane LSH-bucketed approximate search —
  *    the 100 TB path: the corpus shuffles once on a small bucket key and
  *    each query only scans its own bucket(s).
  *
  * All arithmetic is double-precision, computed by codegen'd higher-order
  * functions (`zip_with` + `aggregate`) with strict left-to-right
  * summation — deterministic and engine-portable (matches DuckDB's
  * sequential list fold, so results can be oracle-checked exactly).
  */
object Similarity {

  /** Codegen'd sequential dot product in double precision (see
    * [[graft.functions.DotProduct]] — the interpreted `zip_with` +
    * `aggregate` fold was the measured hot spot). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * `queries` and `corpus` both need (`idCol`, `vecCol`). Self-matches are
    * excluded; ties broken by neighbor id (deterministic). The corpus side
    * pre-normalizes once (norms are computed per row, not per pair). */
  /** Exact per-label centroids of an embedding column, one row per
    * (label, dim): dimension values are decimal-quantized before the sum
    * so partial-aggregation order can't move bits, and the mean divides
    * exact operands — engine-portable with the usual round(6) edge. The
    * shuffle carries (label, dim) keys — |labels|·|dims| groups however
    * many vectors stream through, which is what a 100 TB class-prototype
    * computation (centroid classifier / IVF seeding / drift probe)
    * needs. */
  def labelCentroids(embs: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    embs
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x").cast("double"), 6).cast(DecimalType(20, 6))).as("s"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        col("n"),
        // round through DECIMAL: cross-engine oracles round doubles by
        // different half-rules exactly on the boundary a mean of 6-digit
        // values often hits; decimal rounding is half-up everywhere
        round((col("s").cast("double") / col("n").cast("double"))
          .cast(DecimalType(18, 12)), 6).cast("double").as("centroid"))
  }

  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {

    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv"))
      .withColumn("qnorm", l2Norm(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("cv"))
      .withColumn("cnorm", l2Norm(col("cv")))

    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane component: hash-derived value
    * in [-0.5, 0.5). No RNG state — reproducible across runs/executors. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(1000000L)).cast("double") / 1000000.0) - 0.5

  /** Sign-bucket of a vector under `numPlanes` fixed hyperplanes — the
    * LSH key. Vectors in the same bucket are likely cosine-similar. */
  def hyperplaneBucket(vec: Column, numPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(numPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (v, i) => v.cast("double") * planeComponent(p, i)),
          lit(0.0), (a, v) => a + v)
        acc * 2 + when(proj >= 0, 1L).otherwise(0L)
      })

  /** Deterministic pseudo-random unit-free hyperplane vectors, generated
    * driver-side with splitmix64 (no RNG state object — the same (plane,
    * dim) always yields the same component). Only numPlanes×dim doubles;
    * shipped to executors as literals so the projection is one codegen'd
    * [[graft.functions.DotProduct]] per plane instead of dim interpreted
    * lambda evaluations. */
  private[llm] def planeVectors(numPlanes: Int, dim: Int, offset: Int = 0): Seq[Array[Double]] = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // `offset` shifts the plane index space — table t of a multi-table
    // index uses offset = t * numPlanes, so tables draw INDEPENDENT planes
    // while table 0 reproduces the single-table construction exactly.
    (offset until offset + numPlanes).map { p =>
      Array.tabulate(dim) { i =>
        val h = splitmix64(p.toLong * 1000003L + i)
        (math.abs(h % 1000000L).toDouble / 1000000.0) - 0.5
      }
    }
  }

  /** Sign-bucket against literal plane vectors — the codegen'd form of
    * [[hyperplaneBucket]] (hot path: one vec_dot per plane). */
  private def bucketOf(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p.toSeq)) >= 0, lit(1L << (planes.size - 1 - i)))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: bucket corpus and queries by hyperplane signs,
    * search only within matching buckets. Recall < 1 by construction.
    *
    * The parameter → recall/cost trade (per-plane sign-agreement
    * probability for a neighbor at cosine s is 1 − arccos(s)/π ≡ p; a
    * table finds it with p^numPlanes):
    *  - `numPlanes` DOWN → bigger buckets → higher recall, more
    *    candidates per table (candidate volume ≈ |corpus| / 2^numPlanes
    *    per query per table).
    *  - `multiProbe` → each query also searches every Hamming-1 bucket
    *    (the most-likely-wrong sign is A sign) — recovers most boundary
    *    misses for (numPlanes+1)× the query-side candidate volume; the
    *    corpus still shuffles once per table.
    *  - `numTables` → L independent plane sets (the classic E2LSH lever):
    *    miss probability compounds to (1 − p^numPlanes)^L, so recall
    *    approaches 1 geometrically while cost grows linearly in L. The
    *    corpus fans out L× (one (table, bucket) row per table).
    *
    * Measured on the WORST case (near-uniform random fixture embeddings,
    * top-10 cosine ≈ 0.3 — real corpora cluster and do far better):
    * planes=4/tables=1 → recall@10 0.13 at 7% of brute-force candidates;
    * planes=4/multiProbe → 0.45 at 31%; planes=4/tables=16 → 0.88 at
    * ~100%. LlmOpsSpec pins the ≥0.8 floor at the tables=16 setting. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 8,
      multiProbe: Boolean = false, numTables: Int = 1): DataFrame = {

    // vector width probe: one tiny driver-side job (metadata, not data)
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    val tablePlanes = (0 until numTables)
      .map(t => t -> planeVectors(numPlanes, dim, t * numPlanes))

    def withBuckets(df: DataFrame, id: String, vec: String, probe: Boolean): DataFrame = {
      // one (table, bucket) struct per table; queries under multiProbe add
      // the numPlanes Hamming-1 flips of each table's bucket. Only
      // (id, table, bucket) leaves this relation — vectors NEVER travel
      // through the candidate join (the simhashCosinePairs rule: the
      // candidate shuffle moves 8-byte keys, the verify legs fetch
      // vectors by id), which is what keeps the candidate stage's bytes
      // linear in candidate COUNT at corpus scale.
      val entries = tablePlanes.flatMap { case (t, planes) =>
        val b0 = bucketOf(col(vec), planes)
        val main = struct(lit(t).as("table"), b0.as("bucket"))
        if (!probe) Seq(main)
        else main +: (0 until numPlanes).map(i =>
          struct(lit(t).as("table"), b0.bitwiseXOR(lit(1L << i)).as("bucket")))
      }
      df.select(col(id), explode(array(entries: _*)).as("tb"))
        .select(col(id), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    }

    val qv = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), _.cast("double")).as("cv"))
    val q = withBuckets(qv, "query_id", "qv", multiProbe)
    val c = withBuckets(cv, "neighbor_id", "cv", probe = false)

    val joined = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    // several tables / probe buckets can reach the same (query, neighbor)
    val candidates =
      if (multiProbe || numTables > 1)
        joined.dropDuplicates("query_id", "neighbor_id")
      else joined
    // exact verify: candidate-restricted vector fetch by id (hash joins;
    // the query side is small and broadcasts)
    val scored = candidates
      .join(broadcast(qv.withColumn("qnorm", l2Norm(col("qv")))), Seq("query_id"))
      .join(cv.withColumn("cnorm", l2Norm(col("cv"))), Seq("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding near-dup PAIRS at corpus scale — the bucketed complement
    * of the all-pairs cosine dedup (q27's brute-force form is the oracle
    * baseline; this is what actually runs at 100 TB): every vector gets a
    * `numPlanes`-bit sign signature (random hyperplanes), signatures are
    * banded (`bands` slices), candidate pairs are band-bucket equi-joins
    * on 8-byte keys — vectors never travel through the candidate join —
    * and only candidates get the exact-cosine verify, so output pairs are
    * EXACT (precision 1); recall is the LSH tradeoff, ~1 for genuine
    * near-dups (cos ≥ ~0.99 flips ≲1 of 64 sign bits, and a pair must
    * lose a bit in EVERY band to be missed). Tune bits-per-band
    * (= numPlanes/bands) up for bigger corpora: candidate volume scales
    * as bands · n²/2^bits. */
  def simhashCosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 64, bands: Int = 8): DataFrame = {
    require(numPlanes <= 64 && numPlanes % bands == 0,
      s"need numPlanes ($numPlanes) ≤ 64 and divisible by bands ($bands)")
    val bits = numPlanes / bands
    // bits == 64 (bands = 1): (1L << 64) wraps to 1 and the mask would be
    // 0 — every vector one bucket, the O(n²) cross join this method exists
    // to avoid. The single band's mask is simply all 64 bits.
    def bandMask(b: Int): Long =
      if (bits == 64) -1L else ((1L << bits) - 1) << (b * bits)
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    val planes = planeVectors(numPlanes, dim)
    val sig = df.select(col(idCol).as("id"),
      bucketOf(transform(col(vecCol), _.cast("double")), planes).as("sig"))
    val banded = sig.select(col("id"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            col("sig").bitwiseAND(lit(bandMask(b))).as("slice"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.slice").as("slice"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.slice") === col("b.slice") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"))
      .dropDuplicates("d1", "d2")
    val vecs = df.select(col(idCol).as("vid"),
        transform(col(vecCol), _.cast("double")).as("vv"))
      .withColumn("nn", l2Norm(col("vv")))
    cand
      .join(vecs.select(col("vid").as("d1"), col("vv").as("v1"), col("nn").as("n1")), "d1")
      .join(vecs.select(col("vid").as("d2"), col("vv").as("v2"), col("nn").as("n2")), "d2")
      .withColumn("cos0", dot(col("v1"), col("v2")) / (col("n1") * col("n2")))
      .filter(col("cos0") >= threshold)
      .select(col("d1"), col("d2"), round(col("cos0"), 6).as("cos"))
  }

  /** Spherical k-means fit (Lloyd's iterations, cosine geometry) for IVF
    * cell centroids. Seeds are the `k` corpus vectors with the smallest
    * id-hash (deterministic, no RNG state); each iteration assigns every
    * unit vector to its nearest centroid (one broadcast join — the corpus
    * never shuffles) and recomputes centroids as the normalized
    * element-wise mean (posexplode → per-(cell,dim) partial sums).
    *
    * Only the k×dim centroid matrix ever reaches the driver — model
    * parameters, not data (same contract as MLlib's KMeans). A cell that
    * loses all members keeps its previous centroid.
    *
    * Returns `(cent_id, cv0, cnorm0)` — the shape [[ivfTopK]] consumes. */
  def kmeansCentroids(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val unit = corpus.select(col(idCol).as("vid"),
        transform(col(vecCol), _.cast("double")).as("vv"))
      .withColumn("vnorm", l2Norm(col("vv")))
      .select(col("vid"), transform(col("vv"), x => x / col("vnorm")).as("nv"))

    var cents: Array[Seq[Double]] = unit
      .withColumn("__h", xxhash64(col("vid")))
      .orderBy(col("__h")).limit(k)
      .select("nv").as[Seq[Double]].collect()

    for (_ <- 1 to iters) {
      val cdf = broadcast(
        cents.zipWithIndex.toSeq.map { case (c, i) => (i, c) }.toDF("cell", "cv"))
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("sim").desc, col("cell").asc)
      val means = unit.join(cdf)
        .withColumn("sim", dot(col("nv"), col("cv")))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("cell"), posexplode(col("nv")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
          s => s.getField("sx")).as("mv"))
        .as[(Int, Seq[Double])].collect().toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.get(i).map { m =>
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm > 0) m.map(_ / norm) else old
        }.getOrElse(old)
      }
    }
    cents.zipWithIndex.toSeq
      .map { case (c, i) => (i.toLong, c, 1.0) }
      .toDF("cent_id", "cv0", "cnorm0")
  }

  /** IVF (inverted-file) approximate top-k: a centroid set partitions the
    * corpus into `nCentroids` cells (assignment = nearest centroid by
    * cosine, one broadcast pass); each query probes only its `nProbe`
    * nearest cells. The classic trade: recall grows with `nProbe`, cost
    * grows with `nProbe / nCentroids` of the corpus.
    *
    * Default centroids are the `nCentroids` corpus vectors with the
    * smallest id-hash — deterministic without RNG state; pass
    * `trainIters > 0` for spherical-k-means-trained centroids
    * ([[kmeansCentroids]] — tighter cells, higher recall at the same
    * nProbe). All search stages are joins/windows (no driver-side data
    * paths; the centroid side is broadcast because it is tiny).
    *
    * Parameter → recall/cost: cost ≈ nProbe/nCentroids of the corpus per
    * query; recall rises with that fraction and with training. Measured on
    * the worst-case near-uniform fixture (top-10 cosine ≈ 0.3):
    * nlist=16/nProbe=4 untrained → recall@10 0.48 at 25% scan;
    * nlist=16/nProbe=8 trained → 0.80 at 50%; nlist=32/nProbe=20 trained
    * → ≈0.9 at 62%. Clustered real corpora reach the same recall at far
    * smaller fractions — uniform data is the adversarial case. LlmOpsSpec
    * pins the ≥0.8 floor at nlist=32/nProbe=20/trainIters=2. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4, trainIters: Int = 0): DataFrame = {

    val cents =
      if (trainIters > 0) kmeansCentroids(corpus, idCol, vecCol, nCentroids, trainIters)
      else corpus
        .select(col(idCol).as("cent_id"), transform(col(vecCol), _.cast("double")).as("cv0"))
        .withColumn("__h", xxhash64(col("cent_id")))
        .orderBy(col("__h")).limit(nCentroids)
        .select(col("cent_id"), col("cv0"), l2Norm(col("cv0")).as("cnorm0"))

    def assign(df: DataFrame, id: String, keep: Int): DataFrame = {
      val v = df.select(col(id).as("vid"),
          transform(col(vecCol), _.cast("double")).as("vv"))
        .withColumn("vnorm", l2Norm(col("vv")))
      val w = Window.partitionBy(col("vid"))
        .orderBy(col("ccos").desc, col("cent_id").asc)
      v.join(broadcast(cents))
        .withColumn("ccos", dot(col("vv"), col("cv0")) / (col("vnorm") * col("cnorm0")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .select(col("vid"), col("cent_id").as("cell"), col("vv"), col("vnorm"))
    }

    val corpusCells = assign(corpus, idCol, 1)
      .withColumnRenamed("vid", "neighbor_id")
      .withColumnRenamed("vv", "cv").withColumnRenamed("vnorm", "cnorm")
    val queryCells = assign(queries, idCol, nProbe)
      .withColumnRenamed("vid", "query_id")
      .withColumnRenamed("vv", "qv").withColumnRenamed("vnorm", "qnorm")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    queryCells.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qnorm") * col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold` — the
    * semantic-dedup operator. Exact all-pairs here; at 100 TB swap the
    * join for the LSH bucket join above. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    v.alias("a").join(v.alias("b"), col("a.id") < col("b.id"))
      .withColumn("cos", dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("d1"), col("b.id").as("d2"), col("cos"))
  }

  /** SemDeDup-shape semantic dedup (cluster-then-prune, after Abbas et al.
    * 2023): spherical k-means partitions the corpus into `k` cells, exact
    * cosine pairs are computed WITHIN cells only, near-dup components
    * collapse to one canonical doc each. The quadratic step runs per cell
    * (n²/k per cell in expectation), never corpus-wide — with k scaled
    * ∝ corpus size the pair stage stays linear, which is the whole trick
    * at 100 TB; assignment itself is one broadcast pass (the corpus never
    * shuffles to be assigned).
    *
    * Canonical = smallest id per component (deterministic); pass
    * `keepBest = Some(qualityCol)` to keep the highest-quality doc
    * instead (ties broken by id). Returns the KEPT rows of `df`, all
    * columns intact.
    *
    * Caveat inherited from SemDeDup: a pair straddling a cell boundary is
    * missed — recall, not precision, is the trade (every dropped doc
    * genuinely had an exact-verified near-dup in its cell).
    *
    * `maxCellRows`: skew guard for the per-cell quadratic step. A hot cell
    * (duplicate-heavy corpora concentrate mass) makes one task do
    * n_cell²/2 work; cells above the cap are hash-sub-split so no
    * pair-join partition exceeds ~cap² comparisons. Pairs straddling a
    * sub-split are missed (more recall trade, zero precision trade) —
    * exactly how SemDeDup keeps clusters bounded at corpus scale. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double, trainIters: Int = 2,
      keepBest: Option[String] = None,
      maxCellRows: Option[Int] = None): DataFrame = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, trainIters)
    val v = df.select(col(idCol).as("vid"),
        transform(col(vecCol), _.cast("double")).as("vv"))
      .withColumn("vnorm", l2Norm(col("vv")))
    val w = Window.partitionBy(col("vid"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    val cells0 = v.join(broadcast(cents))
      .withColumn("ccos", dot(col("vv"), col("cv0")) / (col("vnorm") * col("cnorm0")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vid"), col("cent_id").as("cell"), col("vv"), col("vnorm"))
    val cells = maxCellRows match {
      case None => cells0.withColumn("sub", lit(0L))
      case Some(cap) =>
        val sizes = cells0.groupBy(col("cell"))
          .agg(count(lit(1)).as("__n"))
          .withColumn("__splits", greatest(lit(1L), ceil(col("__n") / cap).cast("long")))
          .select(col("cell"), col("__splits"))
        cells0.join(broadcast(sizes), Seq("cell"))
          .withColumn("sub", pmod(xxhash64(col("vid")), col("__splits")))
          .drop("__splits")
    }
    val pairs = cells.alias("a").join(cells.alias("b"),
        col("a.cell") === col("b.cell") && col("a.sub") === col("b.sub") &&
          col("a.vid") < col("b.vid"))
      .withColumn("cos", dot(col("a.vv"), col("b.vv")) / (col("a.vnorm") * col("b.vnorm")))
      .filter(col("cos") >= threshold)
      .select(col("a.vid").as("d1"), col("b.vid").as("d2"))
    val comps = Dedup.connectedComponents(pairs, "d1", "d2")
    val doomed = keepBest match {
      case None =>
        comps.filter(col("id") =!= col("comp")).select(col("id"))
      case Some(q) =>
        val rank = Window.partitionBy(col("comp"))
          .orderBy(col(q).desc, col("id").asc)
        comps.join(df.select(col(idCol).as("id"), col(q)), Seq("id"))
          .withColumn("rk", row_number().over(rank))
          .filter(col("rk") > 1).select(col("id"))
    }
    df.join(doomed.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
  }
}
