package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding ANN — the memory-side scale
  * lever, complementary to IVF's candidate pruning: split each vector into
  * `NumSubspaces` contiguous subvectors, k-means-train a tiny codebook per
  * subspace, and store each vector as one code per subspace. At dim 64 /
  * 8 subspaces / 4 codes that is 8 bytes of codes per vector instead of
  * 256 bytes of floats — a 100 TB embedding corpus scans as ~3 TB of
  * codes, which is what makes exhaustive ANN affordable at all.
  *
  * Scoring is ADC (asymmetric distance computation): the QUERY stays full
  * precision and precomputes, per subspace, its dot product with each of
  * the K codewords (an M×K lookup table, built once per query); a
  * database vector's approximate cosine is then M table lookups + its
  * cached reconstruction norm — no float vector is ever touched at scan
  * time. Here the scan is exhaustive over codes (the pure-PQ model); at
  * 100 TB compose with the existing IVF cells (IVF-PQ: prune cells, then
  * ADC within probed cells) and rerank the top candidates with
  * [[Similarity]]'s exact kernels.
  *
  * Determinism/oracle: subspace training reuses the integer-quantized
  * mean trick of `Similarity.trainedCentroids` (per-dimension sums of
  * x·2²⁰ are exact integers; the pinned toDouble / n / quantum division
  * order reproduces identical FLOAT codewords in DuckDB), assignments
  * break distance ties by lowest code id, and every double expression is
  * written left-to-right so the SQL mirror is bit-identical. The whole
  * pipeline — training loop, encoding, ADC ranking — is replayed by the
  * `ann_pq` oracle.
  */
object ProductQuantization {

  val NumSubspaces = 8
  val NumCodes = 8
  val TrainIters = 2
  /** Deterministic training sample: both k-means loops (IVF cells and PQ
    * codebooks) train on the first [[TrainSampleN]] vectors by id — the
    * FAISS practice: codebook quality saturates long before the corpus
    * does, so training cost must not scale with it. The full corpus is
    * still encoded and scanned; only the Lloyd's passes are sampled. The
    * same `vec_id < N` predicate is mirrored into the oracles, so the
    * sampled training replays exactly.
    */
  val TrainSampleN = 4000
  /** ADC candidate depth before the exact rerank in [[pqTopK]]. */
  val RerankDepth = 50
  /** Same quantum as Similarity.MeanQuantum — shared mean-portability trick. */
  val MeanQuantum: Long = Similarity.MeanQuantum

  /** Codebooks as codebooks(m)(k) = codeword vector (subDim floats). */
  type Codebooks = Array[Array[Array[Float]]]

  private def subDimOf(dim: Int): Int = {
    require(dim % NumSubspaces == 0,
      s"embedding dim $dim not divisible into $NumSubspaces subspaces")
    dim / NumSubspaces
  }

  /** Subvector m of the embedding column (1-based slice). */
  private def subCol(m: Int, subDim: Int): Column =
    slice(col("embedding"), m * subDim + 1, subDim)

  /** Left-to-right squared L2 distance between a subvector column and a
    * codeword literal, all in double (float element reads cast up, like
    * FloatVecDot): ((v1−c1)² + (v2−c2)²) + … — the SQL mirror chains +
    * left-associatively over the same operands.
    */
  private def l2Sq(sub: Column, cw: Array[Float]): Column =
    cw.zipWithIndex.map { case (c, d) =>
      val diff = element_at(sub, d + 1).cast("double") - lit(c.toDouble)
      diff * diff
    }.reduceLeft(_ + _)

  /** Code assignment: argmin_k L2²(sub, codeword_k), ties to the lowest
    * code id — `array_min` over (distance, k) structs compares
    * lexicographically, which is exactly that rule.
    */
  private def bestCode(sub: Column, cws: Array[Array[Float]]): Column =
    array_min(array(cws.zipWithIndex.map { case (cw, k) =>
      struct(l2Sq(sub, cw).as("d"), lit(k).as("k"))
    }: _*)).getField("k")

  /** First `NumCodes` corpus vectors (by vec_id), sliced into per-subspace
    * seed codewords — the same deterministic seeding rule as IVF's
    * first-n centroids, applied per subspace. Bounded collect (K rows).
    */
  private def seedCodebooks(embeddings: DataFrame, subDim: Int): Codebooks = {
    val rows = embeddings.where(col("embedding").isNotNull)
      .orderBy(col("vec_id").asc).limit(NumCodes)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    Array.tabulate(NumSubspaces)(m =>
      rows.map(v => v.slice(m * subDim, (m + 1) * subDim)))
  }

  /** Per-subspace Lloyd's loop, all subspaces trained in ONE scan per
    * round: assign every vector its M codes, explode dimensions, and
    * hash-agg integer-quantized sums keyed by (subspace, code, dim) —
    * map-side combined, and the driver collects exactly
    * M × K × subDim (= 256 here) rows per round. Empty codes keep their
    * previous codeword, like empty IVF cells.
    */
  def trainCodebooks(embeddings: DataFrame, iters: Int = TrainIters): Codebooks = {
    val dim = embeddings.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(NumSubspaces)
    val subDim = subDimOf(dim)
    var cb = seedCodebooks(embeddings, subDim)
    var it = 0
    while (it < iters && cb.head.nonEmpty) {
      val codeCols = (0 until NumSubspaces)
        .map(m => bestCode(subCol(m, subDim), cb(m)).as(s"code$m"))
      val sums = graft.Parallelism.ensure(embeddings.where(col("embedding").isNotNull))
        .select(codeCols :+ posexplode(col("embedding")).as(Seq("pos", "x")): _*)
        .select(
          (col("pos") / subDim).cast("int").as("m"),
          element_at(
            array((0 until NumSubspaces).map(m => col(s"code$m")): _*),
            (col("pos") / subDim).cast("int") + 1).as("code"),
          (col("pos") % subDim).as("d"),
          col("x"))
        .groupBy("m", "code", "d")
        .agg(
          sum(round(col("x").cast("double") * MeanQuantum).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val grouped = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
      cb = Array.tabulate(NumSubspaces) { m =>
        Array.tabulate(NumCodes) { k =>
          grouped.get((m, k)) match {
            case Some(rows) =>
              rows.sortBy(_.getInt(2)).map { r =>
                // pinned order: toDouble, / n, / quantum — the oracle
                // divides identically, so codeword bits agree exactly
                (r.getLong(3).toDouble / r.getLong(4) / MeanQuantum.toDouble).toFloat
              }
            case None => cb(m)(k)
          }
        }
      }
      it += 1
    }
    cb
  }

  /** Encode the corpus: M code columns + the cached reconstruction norm²
    * (Σ_m |codeword(m, code_m)|², via per-subspace norm lookup arrays).
    * This frame IS the compressed index — 8 small ints + 1 double per
    * vector.
    */
  private def codeColsOf(cb: Codebooks, subDim: Int): Seq[Column] =
    (0 until NumSubspaces)
      .map(m => bestCode(subCol(m, subDim), cb(m)).as(s"code$m"))

  /** Σ_m |codeword(m, code_m)|² via per-subspace norm lookup arrays —
    * the cached reconstruction norm of an encoded vector.
    */
  private def reconNormSqCol(cb: Codebooks): Column =
    (0 until NumSubspaces).map { m =>
      val norms = cb(m).map(cw =>
        cw.map(c => c.toDouble * c.toDouble).reduceLeft(_ + _))
      element_at(array(norms.map(lit(_)): _*), col(s"code$m") + 1)
    }.reduceLeft(_ + _)

  def encode(embeddings: DataFrame, cb: Codebooks): DataFrame = {
    val subDim = cb.head.head.length
    // materialize the code columns BEFORE deriving recon_norm_sq: without
    // the barrier CollapseProject inlines each code's full argmin tree
    // into the norm lookup — every code computed twice, and the single
    // fused projection is big enough to threaten janino's method limit
    // (interpreted fallback = a silent 2-3x on the corpus scan). The
    // materialized frame IS the compressed index (vec_id + M small ints),
    // the artifact a production IVF-PQ build writes to storage.
    val codes = embeddings.where(col("embedding").isNotNull)
      .select(col("vec_id") +: codeColsOf(cb, subDim): _*)
      .localCheckpoint()
    codes.withColumn("recon_norm_sq", reconNormSqCol(cb))
  }

  /** Per-query ADC lookup tables: for subspace m an array over codes k of
    * dot(q_m, codeword_k) — built once per query row, left-to-right like
    * every other double chain here.
    */
  private def lutColsOf(cb: Codebooks, subDim: Int): Seq[Column] =
    (0 until NumSubspaces).map { m =>
      array(cb(m).map { cw =>
        cw.zipWithIndex.map { case (c, d) =>
          element_at(subCol(m, subDim), d + 1).cast("double") * lit(c.toDouble)
        }.reduceLeft(_ + _)
      }: _*).as(s"lut$m")
    }

  /** Exact query norm (full-precision side of the asymmetric distance). */
  private def qNormCol(dim: Int): Column =
    sqrt((0 until dim).map { d =>
      val x = element_at(col("embedding"), d + 1).cast("double")
      x * x
    }.reduceLeft(_ + _))

  /** The ADC score: M lookups into the per-query tables, summed
    * left-associatively over subspaces.
    */
  private def adcScoreCol: Column =
    (0 until NumSubspaces)
      .map(m => element_at(col(s"lut$m"), col(s"code$m") + 1))
      .reduceLeft(_ + _)

  /** ADC ranking: queries (vec_id < nQueries, full precision) precompute
    * their M×K dot-product lookup arrays once; the exhaustive scan over
    * the code frame then scores each vector with M `element_at` lookups,
    * and a per-query window ranks by approximate cosine (DESC, neighbor
    * ASC ties). The query side broadcasts — the corpus side streams
    * through the scan untouched.
    */
  def adcTopK(embeddings: DataFrame, cb: Codebooks, k: Int, nQueries: Int): DataFrame = {
    val subDim = cb.head.head.length
    val codes = encode(embeddings, cb)
    val queries = embeddings
      .where(col("embedding").isNotNull && col("vec_id") < nQueries)
      .select(Seq(col("vec_id").as("query_id"),
        qNormCol(NumSubspaces * subDim).as("q_norm")) ++ lutColsOf(cb, subDim): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id").asc)
    codes.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("approx_cos", adcScoreCol / (col("q_norm") * sqrt(col("recon_norm_sq"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  /** Exact-cosine rerank of (query_id, neighbor_id) candidate pairs to the
    * final top k — shared tail of the flat-PQ and IVF-PQ paths; exact math
    * touches only queries×depth rows.
    */
  private def exactRerank(cand: DataFrame, embeddings: DataFrame, k: Int): DataFrame = {
    val e = embeddings.where(col("embedding").isNotNull)
    val q = e.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val cos = Similarity.dot(col("qv"), col("nv")) /
      (sqrt(Similarity.dot(col("qv"), col("qv"))) * sqrt(Similarity.dot(col("nv"), col("nv"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(q, "query_id").join(n, "neighbor_id")
      .withColumn("cos", cos)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** PQ ANN, production shape: ADC over the compressed codes recalls the
    * top [[RerankDepth]] candidates per query, then the exact float
    * kernel reranks those to the final top k — the compressed scan does
    * the corpus-scale work, exact math touches only k·queries·depth rows.
    * `rerankDepth = 0` returns the pure-ADC ranking (the spec measures
    * both: raw ADC ordering quality, and post-rerank recall).
    */
  def pqTopK(
      embeddings: DataFrame, k: Int = 5, nQueries: Int = 10,
      rerankDepth: Int = RerankDepth): DataFrame = {
    // one parquet read feeds the training rounds, the encode scan, the
    // query LUT build and the rerank (~8 passes otherwise)
    val emb = embeddings.localCheckpoint()
    val cb = trainCodebooks(emb.where(col("vec_id") < TrainSampleN))
    // empty corpus → no seeds → no codebooks: return the empty result
    // frame (same schema) instead of building zero-arm argmin expressions
    if (cb.head.isEmpty)
      return embeddings.where(lit(false)).select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank"))
    if (rerankDepth <= 0) return adcTopK(emb, cb, k, nQueries)
    val cand = adcTopK(emb, cb, rerankDepth, nQueries)
      .select("query_id", "neighbor_id")
    exactRerank(cand, emb, k)
  }

  /** IVF nProbe dial for the composed index (same as `Similarity.ivfTopK`). */
  val IvfProbe = 3
  val IvfLists = 8
  val IvfIters = 2

  /** IVF-ADC (IVF-PQ): the production 100-TB ANN shape — BOTH scale levers
    * at once. The IVF side prunes candidates (each query touches only its
    * `nProbe` nearest cells, not the corpus); the PQ side compresses what
    * remains (the probed cells are scanned as 8-byte codes via the same
    * ADC lookup tables as [[adcTopK]], never as float vectors). Exact math
    * is confined to the final rerank of `rerankDepth` candidates per
    * query. Versus the flat ADC scan this replaces the one deliberately
    * exhaustive corpus×queries join in the suite with a keyed equi-join on
    * cell id; versus `ivfTopK` the probed cells stream as codes, not
    * floats.
    *
    * Determinism: IVF centroids come from [[Similarity.trainedCentroids]]
    * (quantized-mean portable k-means, cells tie-broken (cos DESC, id
    * DESC)) and codebooks from [[trainCodebooks]] (same trick per
    * subspace, codes tie-broken (L2 ASC, code ASC)); both training loops,
    * the cell probe, the restricted ADC scan, and the rerank are replayed
    * bit-for-bit by the `ann_ivfpq` oracle.
    */
  def ivfPqTopK(
      embeddings: DataFrame, k: Int = 5, nQueries: Int = 10,
      nLists: Int = IvfLists, nProbe: Int = IvfProbe, ivfIters: Int = IvfIters,
      rerankDepth: Int = RerankDepth): DataFrame = {
    // one parquet read feeds BOTH training loops, the index build, the
    // query LUTs and the rerank; the Lloyd's passes see only the sample
    val emb = embeddings.localCheckpoint()
    val sample = emb.where(col("vec_id") < TrainSampleN)
    val cents = Similarity.trainedCentroids(sample, nLists, ivfIters)
    val cb = trainCodebooks(sample)
    if (cents.isEmpty || cb.head.isEmpty)
      return embeddings.where(lit(false)).select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank"))
    val subDim = cb.head.head.length
    // the compressed index: cell id + M codes + cached reconstruction norm²
    // per vector — ONE scan builds all of it (cell assignment and code
    // assignment side by side), materialized as the index artifact (same
    // anti-CollapseProject barrier rationale as [[encode]]), and nothing
    // full-precision survives it
    val indexed = graft.Parallelism.ensure(emb.where(col("embedding").isNotNull))
      .select(Seq(col("vec_id"),
        Similarity.bestCellOf(cents)(col("embedding")).as("cell")) ++
        codeColsOf(cb, subDim): _*)
      .localCheckpoint()
      .withColumn("recon_norm_sq", reconNormSqCol(cb))
    val queries = emb
      .where(col("embedding").isNotNull && col("vec_id") < nQueries)
      .select(Seq(col("vec_id").as("query_id"),
        qNormCol(NumSubspaces * subDim).as("q_norm"),
        explode(Similarity.probeCellsOf(cents, nProbe)(col("embedding"))).as("cell")) ++
        lutColsOf(cb, subDim): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("approx_cos").desc, col("vec_id").asc)
    val cand = indexed.join(broadcast(queries), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("approx_cos", adcScoreCol / (col("q_norm") * sqrt(col("recon_norm_sq"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= rerankDepth)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    exactRerank(cand, emb, k)
  }
}
