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
  /** Default query-batch size for the two PQ ANN queries (the other ANN
    * family members use 10). Raised 10 → 40 in round 7: with the janino
    * recompiles killed and both training loops fused, a 10-query batch
    * measured ONLY the shared sample-bounded training floor — the scan,
    * which is the term the IVF index exists to prune (and the term that
    * scales with the corpus), was ~10% of either query's time. At 40
    * queries the bench exercises what the two shapes actually trade:
    * `ann_pq` scores corpus × queries, `ann_ivfpq` only the probed 3/8.
    */
  val NumQueries = 40
  /** Same quantum as Similarity.MeanQuantum — shared mean-portability trick. */
  val MeanQuantum: Long = Similarity.MeanQuantum

  /** Codebooks as codebooks(m)(k) = codeword vector (subDim floats). */
  type Codebooks = Array[Array[Array[Float]]]

  private def subDimOf(dim: Int): Int = {
    require(dim % NumSubspaces == 0,
      s"embedding dim $dim not divisible into $NumSubspaces subspaces")
    dim / NumSubspaces
  }

  /** All M code assignments in one codegen'd kernel call — argmin_k
    * L2²(sub_m, codeword_k) per subspace, ties to the lowest code id, with
    * the codebooks riding as a reference object so the generated code is
    * identical across codebook sets. The per-codebook
    * `array_min(array(K literal structs))` form this replaced was
    * re-janino-compiled for every Lloyd's round / encode scan / LUT build
    * of BOTH `ann_pq` and `ann_ivfpq` (the round-6 `ann_ivfpq` bench
    * finding); arithmetic is bit-identical — see
    * [[graft.functions.SubspaceCodes]].
    */
  private def codesCol(cb: Codebooks): Column =
    graft.functions.VectorExpressions.subspaceCodes(col("embedding"), cb)

  /** First `NumCodes` non-null corpus vectors by vec_id — the codebook
    * seeds, and (sliced per subspace) the same deterministic seeding rule
    * as IVF's first-n centroids. Bounded collect (K rows).
    */
  private def seedVectors(embeddings: DataFrame): Array[Array[Float]] =
    embeddings.where(col("embedding").isNotNull)
      .orderBy(col("vec_id").asc).limit(NumCodes)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)

  private def sliceCodebooks(rows: Array[Array[Float]], subDim: Int): Codebooks =
    Array.tabulate(NumSubspaces)(m =>
      rows.map(v => v.slice(m * subDim, (m + 1) * subDim)))

  /** Per-subspace Lloyd's loop, all subspaces trained in ONE scan per
    * round: assign every vector its M codes, explode dimensions, and
    * hash-agg integer-quantized sums keyed by (subspace, code, dim) —
    * map-side combined, and the driver collects exactly
    * M × K × subDim (= 256 here) rows per round. Empty codes keep their
    * previous codeword, like empty IVF cells.
    */
  def trainCodebooks(embeddings: DataFrame, iters: Int = TrainIters): Codebooks = {
    // dim comes from the seed vectors themselves — the separate
    // `select(size(embedding)).head(1)` job this replaces was pure
    // scheduler overhead (training fixed cost is what dominates these
    // queries at bench SF)
    val seeds = seedVectors(embeddings)
    if (seeds.isEmpty) return Array.fill(NumSubspaces)(Array.empty)
    val subDim = subDimOf(seeds.head.length)
    var cb = sliceCodebooks(seeds, subDim)
    var it = 0
    while (it < iters && cb.head.nonEmpty) {
      val sums = graft.Parallelism.ensure(embeddings.where(col("embedding").isNotNull))
        .select(codesCol(cb).as("codes"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(
          (col("pos") / subDim).cast("int").as("m"),
          element_at(col("codes"), (col("pos") / subDim).cast("int") + 1).as("code"),
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

  def encode(embeddings: DataFrame, cb: Codebooks): DataFrame = {
    // materialize the code array, then derive recon_norm_sq from the codes
    // alone — the materialized frame IS the compressed index (vec_id + an
    // array of M small ints), the artifact a production IVF-PQ build
    // writes to storage, and the barrier keeps the norm lookup reading
    // codes instead of re-running the assignment kernel per subspace
    val codes = embeddings.where(col("embedding").isNotNull)
      .select(col("vec_id"), codesCol(cb).as("codes"))
      .localCheckpoint()
    codes.withColumn("recon_norm_sq",
      graft.functions.VectorExpressions.codesReconNorm(col("codes"), cb))
  }

  /** Per-query ADC lookup tables: `luts[m][k] = dot(q_m, codeword_k)`,
    * built once per query row as ONE kernel call (same reference-object
    * rationale as [[codesCol]]), left-to-right like every other double
    * chain here — see [[graft.functions.SubspaceLuts]].
    */
  private def lutsCol(cb: Codebooks): Column =
    graft.functions.VectorExpressions.subspaceLuts(col("embedding"), cb)

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
      .map(m => element_at(element_at(col("luts"), m + 1), element_at(col("codes"), m + 1) + 1))
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
      .select(col("vec_id").as("query_id"),
        qNormCol(NumSubspaces * subDim).as("q_norm"), lutsCol(cb).as("luts"))
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
      embeddings: DataFrame, k: Int = 5, nQueries: Int = NumQueries,
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

  /** [[pqTopK]] against the PERSISTED codebooks ([[CentroidStore]]): the
    * per-subspace k-means runs once per (dir, iters) ever; afterwards the
    * apply path reads back M×K parquet rows and runs encode + ADC +
    * rerank only. Hash-identical to the always-retrain form, so
    * `ann_pq_stored` shares `ann_pq`'s oracle verbatim.
    */
  def pqTopKStored(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 5, nQueries: Int = NumQueries,
      rerankDepth: Int = RerankDepth): DataFrame = {
    val embeddings = graft.Tables.embeddings(spark, dir)
    val cb = CentroidStore.pqCodebooks(spark, dir)
    if (cb.head.isEmpty)
      return embeddings.where(lit(false)).select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank"))
    val emb = embeddings.localCheckpoint()
    if (rerankDepth <= 0) return adcTopK(emb, cb, k, nQueries)
    val cand = adcTopK(emb, cb, rerankDepth, nQueries)
      .select("query_id", "neighbor_id")
    exactRerank(cand, emb, k)
  }

  /** IVF centroids AND PQ codebooks trained together — the fixed-cost
    * lever behind `ann_ivfpq`'s bench time. Both Lloyd's loops are the
    * same shape (assign → integer-quantized per-dimension sums → bounded
    * driver rebuild), so each round runs as ONE job over the sample: the
    * cell-keyed rows and the code-keyed rows are tagged, unioned, and
    * aggregated through a single shuffle, and one seed collect serves
    * both loops. Run separately (round 6), the two loops paid ~7
    * scheduler round-trips of fixed cost each on a 4k-row sample, which
    * kept `ann_ivfpq` ABOVE flat PQ despite scanning only 3/8 of the
    * corpus.
    *
    * Bit-identical to `Similarity.trainedCentroids` + [[trainCodebooks]]:
    * integer sums are order-independent so the union changes nothing, each
    * round's assignments read the previous round's state exactly as the
    * separate loops do, and the rebuild divisions are pinned in the same
    * order — the `ann_ivfpq` oracle replays unchanged. Seeds are shared
    * only when the first rows carry no null embedding (always true for
    * the driver tables); any null falls back to the two exact seed
    * queries so edge semantics stay identical too.
    */
  private[graft] def trainIvfAndCodebooks(
      sample: DataFrame, nLists: Int, ivfIters: Int, cbIters: Int = TrainIters):
      (Array[(Int, Array[Float])], Codebooks) = {
    val first = sample.orderBy(col("vec_id").asc)
      .limit(math.max(nLists, NumCodes))
      .select(col("embedding")).collect()
    if (first.isEmpty)
      return (Array.empty, Array.fill(NumSubspaces)(Array.empty))
    if (first.exists(_.isNullAt(0)))
      return (Similarity.trainedCentroids(sample, nLists, ivfIters),
        trainCodebooks(sample, cbIters))
    val vecs = first.map(_.getSeq[Float](0).toArray)
    val subDim = subDimOf(vecs.head.length)
    var cents = vecs.take(nLists).zipWithIndex.map(_.swap)
    var cb = sliceCodebooks(vecs.take(NumCodes), subDim)
    var it = 0
    while (it < math.max(ivfIters, cbIters)) {
      val doCells = it < ivfIters && cents.nonEmpty
      val doCodes = it < cbIters
      val base = graft.Parallelism.ensure(sample.where(col("embedding").isNotNull))
        .select(
          Similarity.bestCellOf(cents)(col("embedding")).as("cell"),
          codesCol(cb).as("codes"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
      // ONE aggregation serves both loops: group by the JOINT key
      // (cell, code-at-pos, pos) — cells × codes × dim = 4096 bounded
      // rows — and marginalize driver-side with exact integer adds:
      // cell sums collapse the code axis, code sums collapse the cell
      // axis. Integer partial sums re-sum to the same totals in any
      // grouping, so both rebuilt states are bit-identical to the
      // separate loops', and the round costs no more than a single
      // loop's round (same exploded rows, one shuffle).
      val mCol = (col("pos") / subDim).cast("int")
      val cellKey = if (doCells) col("cell") else lit(0)
      val codeKey = if (doCodes) element_at(col("codes"), mCol + 1) else lit(0)
      val sums = base
        .groupBy(cellKey.as("cell"), codeKey.as("code"), col("pos"))
        .agg(
          sum(round(col("x").cast("double") * MeanQuantum).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      if (doCells) {
        val cellAgg = new scala.collection.mutable.HashMap[(Int, Int), (Long, Long)]()
        sums.foreach { r =>
          val k = (r.getInt(0), r.getInt(2))
          val (s0, n0) = cellAgg.getOrElse(k, (0L, 0L))
          cellAgg(k) = (s0 + r.getLong(3), n0 + r.getLong(4))
        }
        cents = cents.map { case (i, old) =>
          val dims = cellAgg.keys.filter(_._1 == i).map(_._2).toArray.sorted
          if (dims.isEmpty) (i, old)
          else (i, dims.map { pos =>
            val (s, n) = cellAgg((i, pos))
            // pinned order: toDouble, / n, / quantum — as the oracle
            (s.toDouble / n / MeanQuantum.toDouble).toFloat
          })
        }
      }
      if (doCodes) {
        val codeAgg = new scala.collection.mutable.HashMap[(Int, Int, Int), (Long, Long)]()
        sums.foreach { r =>
          val pos = r.getInt(2)
          val k = (pos / subDim, r.getInt(1), pos % subDim)
          val (s0, n0) = codeAgg.getOrElse(k, (0L, 0L))
          codeAgg(k) = (s0 + r.getLong(3), n0 + r.getLong(4))
        }
        cb = Array.tabulate(NumSubspaces) { m =>
          Array.tabulate(NumCodes) { k =>
            val dims = codeAgg.keys.filter(t => t._1 == m && t._2 == k)
              .map(_._3).toArray.sorted
            if (dims.isEmpty) cb(m)(k)
            else dims.map { d =>
              val (s, n) = codeAgg((m, k, d))
              (s.toDouble / n / MeanQuantum.toDouble).toFloat
            }
          }
        }
      }
      it += 1
    }
    (cents, cb)
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
      embeddings: DataFrame, k: Int = 5, nQueries: Int = NumQueries,
      nLists: Int = IvfLists, nProbe: Int = IvfProbe, ivfIters: Int = IvfIters,
      rerankDepth: Int = RerankDepth): DataFrame = {
    // one parquet read feeds BOTH training loops, the index build, the
    // query LUTs and the rerank; the Lloyd's passes see only the sample
    val emb = embeddings.localCheckpoint()
    val sample = emb.where(col("vec_id") < TrainSampleN)
    val (cents, cb) = trainIvfAndCodebooks(sample, nLists, ivfIters)
    ivfPqProbe(embeddings, emb, cents, cb, k, nQueries, nProbe, rerankDepth)
  }

  /** [[ivfPqTopK]] against the PERSISTED artifacts: sample-trained IVF
    * centroids + PQ codebooks from [[CentroidStore]] (trained once per
    * corpus, bit-identical to the joint loop — see
    * [[trainIvfAndCodebooks]]'s equivalence note), then index build +
    * probe + rerank only. Shares `ann_ivfpq`'s oracle verbatim.
    */
  def ivfPqTopKStored(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 5, nQueries: Int = NumQueries,
      nLists: Int = IvfLists, nProbe: Int = IvfProbe,
      rerankDepth: Int = RerankDepth): DataFrame = {
    val embeddings = graft.Tables.embeddings(spark, dir)
    val cents = CentroidStore.ivfSampleCentroids(spark, dir, nLists)
    val cb = CentroidStore.pqCodebooks(spark, dir)
    if (cents.isEmpty || cb.head.isEmpty)
      return embeddings.where(lit(false)).select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank"))
    ivfPqProbe(embeddings, embeddings.localCheckpoint(), cents, cb,
      k, nQueries, nProbe, rerankDepth)
  }

  /** The APPLY half of IVF-PQ (index build + cell probe + ADC + rerank)
    * under an already-trained (centroids, codebooks) pair.
    */
  private def ivfPqProbe(
      embeddings: DataFrame, emb: DataFrame,
      cents: Array[(Int, Array[Float])], cb: Codebooks,
      k: Int, nQueries: Int, nProbe: Int, rerankDepth: Int): DataFrame = {
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
    // no checkpoint barrier here (unlike [[encode]]): recon_norm_sq reads
    // the codes COLUMN, so after CollapseProject the code-assignment
    // kernel appears twice in one projection and codegen's subexpression
    // elimination evaluates it once — the single-pass index build feeds
    // the probe join directly. No Parallelism.ensure either: the
    // assignment kernels are ~1 µs/row (not the shingling-class work that
    // guard exists for), a production corpus arrives already split, and
    // on the single-row-group bench files the round-robin shuffle of the
    // whole corpus cost more than the scan it parallelized
    val indexed = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"),
        Similarity.bestCellOf(cents)(col("embedding")).as("cell"),
        codesCol(cb).as("codes"))
      .withColumn("recon_norm_sq",
        graft.functions.VectorExpressions.codesReconNorm(col("codes"), cb))
    val queries = emb
      .where(col("embedding").isNotNull && col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        qNormCol(NumSubspaces * subDim).as("q_norm"),
        explode(Similarity.probeCellsOf(cents, nProbe)(col("embedding"))).as("cell"),
        lutsCol(cb).as("luts"))
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
