package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force cosine top-k as the correctness baseline, embedding-cosine
  * near-dup pairs, and a random-hyperplane LSH bucketed variant as the
  * scale path.
  *
  * All vector math is built-in higher-order functions (`zip_with` +
  * `aggregate`) over the array — elementwise, evaluated in array order, so
  * the double results are bit-reproducible. No UDFs.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * scans candidates once — linear in corpus size, no shuffle until the
  * final per-query top-k (TakeOrdered-style via window over query_id).
  * The LSH path buckets both sides on deterministic hyperplane sign
  * patterns, turning the scan into an equi-join; recall is tunable with
  * `planes` (fewer planes → bigger buckets → higher recall).
  */
object Similarity {

  /** Σ aᵢbᵢ in double, left-to-right — the codegen'd native expression
    * ([[graft.functions.FloatVecDot]]); bit-identical to the HOF
    * `aggregate(zip_with(...))` form it replaced, ~10× faster.
    */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = graft.functions.VectorExpressions.vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors by cosine for each query vector (vec_id <
    * nQueries), excluding self. Query side is broadcast; candidates are
    * scanned once. Output: (query_id, rank, neighbor_id) — ids only, since
    * float similarity values are not oracle-portable across engines.
    *
    * Norms are projected per ROW before the join (the join boundary stops
    * Catalyst from inlining them into the pair expression), so each pair
    * costs one dot product, not dot + two norms — 3× fewer flops on the
    * O(n·q) hot path.
    */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val queries = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"))
    val cand = embeddings.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(queries)
      .join(cand, col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .select(col("query_id"), col("neighbor_id"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).
    * Brute force at test scale; the LSH bucketing below is the 100 TB path.
    * Pairs only — see [[bruteForceTopK]] on float portability; norms
    * precomputed per row as there.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double = 0.45): DataFrame = {
    val a = embeddings.select(
      col("vec_id").as("vec_a"), col("embedding").as("va"), norm(col("embedding")).as("na"))
    val b = embeddings.select(
      col("vec_id").as("vec_b"), col("embedding").as("vb"), norm(col("embedding")).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .where(dot(col("va"), col("vb")) / (col("na") * col("nb")) >= threshold)
      .select(col("vec_a"), col("vec_b"))
  }

  /** Deterministic ±1 random hyperplanes from md5 — reproducible across
    * runs and engines, no RNG state. One set per (table, plane).
    */
  private[operators] def hyperplanes(table: Int, planes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dim) { (p, d) =>
      val h = md.digest(s"$table:$p:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Sign-pattern bucket id of a vector under a table's hyperplanes. */
  private def bucketId(v: Column, hps: Array[Array[Double]]): Column =
    hps.indices
      .map { p =>
        val hp = array(hps(p).map(lit): _*)
        when(dot(v, hp) > 0, 1L << p).otherwise(0L)
      }
      .foldLeft(lit(0L))(_ + _)

  /** IVF (inverted-file) ANN: partition the corpus into `nLists` cells by
    * nearest centroid, search only the query's `nProbe` closest cells, then
    * exact-cosine rerank. Centroids here are the first `nLists` corpus
    * vectors — deterministic and cheap; a production build would run a few
    * k-means rounds with the same plumbing (assignment is the same
    * argmax-over-centroids expression either way).
    *
    * Scale notes: centroids ship as literals (broadcast by value, no
    * shuffle); assignment is a linear scan (n·nLists dots, map-only);
    * candidate generation is an equi-join on cell id, so per-query work is
    * the probed cells' sizes, not the corpus. The recall/cost dials are
    * nLists (cell granularity) and nProbe (cells searched).
    */
  def ivfTopK(
      embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
      nLists: Int = 8, nProbe: Int = 3): DataFrame = {
    val centroids: Array[(Int, Array[Float])] = embeddings
      .orderBy("vec_id").limit(nLists)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray).zipWithIndex.map(_.swap)
    if (centroids.isEmpty) {
      // empty corpus → no cells; empty result with the output schema
      return embeddings.select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank")).limit(0)
    }

    // array of (cosine-to-centroid, cell-id) structs for a vector column
    def cellScores(v: Column): Column = array(centroids.map { case (i, c) =>
      val cl = array(c.map(lit): _*)
      struct(
        (dot(v, cl) / (norm(v) * math.sqrt(c.map(x => x.toDouble * x).sum))).as("c"),
        lit(i).as("i"))
    }: _*)
    // struct ordering is field-by-field, so array_max picks the best cosine
    def bestCell(v: Column): Column = array_max(cellScores(v)).getField("i")
    def probeCells(v: Column): Column =
      transform(slice(reverse(array_sort(cellScores(v))), 1, nProbe), s => s.getField("i"))

    val assigned = embeddings.select(
      col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"), bestCell(col("embedding")).as("cell"))
    val queries = embeddings
      .where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"),
        explode(probeCells(col("embedding"))).as("cell"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(queries)
      .join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .select(col("query_id"), col("neighbor_id"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }

  /** LSH-bucketed ANN with `tables` independent hash tables of `planes`
    * sign bits each: a candidate is considered if it shares a bucket with
    * the query in ANY table (union), then exact cosine reranks the
    * candidates. For a pair at angle θ the per-table collision prob is
    * (1-θ/π)^planes; tables multiply recall at linear cost — the standard
    * recall/cost dial. Each vector is bucketed `tables` times (a constant),
    * and candidate generation is an equi-join on (table, bucket) — no scan
    * of the full corpus per query, which is the 100 TB point.
    */
  def lshTopK(
      embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
      planes: Int = 4, tables: Int = 8): DataFrame = {
    // hyperplanes must span the actual embedding dimension — a hardcoded
    // dim would silently bucket on a prefix of longer vectors
    val firstVec = embeddings.select(col("embedding")).limit(1).collect()
    if (firstVec.isEmpty) {
      return embeddings.select(
        col("vec_id").as("query_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("rank")).limit(0)
    }
    val dim = firstVec(0).getSeq[Float](0).length
    val allHps = (0 until tables).map(t => hyperplanes(t, planes, dim))
    def bucketed(df: DataFrame): DataFrame =
      df.select(
        col("*"),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("table"), bucketId(col("embedding"), allHps(t)).as("bucket"))
        }: _*)).as("tb"))
        .select(col("*"), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
        .drop("tb")
    val queries = bucketed(embeddings.where(col("vec_id") < nQueries))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        norm(col("embedding")).as("qn"), col("table"), col("bucket"))
    val cands = bucketed(embeddings)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"),
        norm(col("embedding")).as("cn"), col("table"), col("bucket"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    broadcast(queries)
      .join(cands, Seq("table", "bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"), col("qn"), col("cn"))
      .dropDuplicates("query_id", "neighbor_id") // union the tables
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .select(col("query_id"), col("neighbor_id"), row_number().over(w).as("rank"))
      .where(col("rank") <= k)
  }
}
