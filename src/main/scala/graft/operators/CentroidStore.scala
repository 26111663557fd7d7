package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Session-persisted TRAINED-INDEX artifacts — IVF centroids and PQ
  * codebooks — the third leg of the train-once/apply-everywhere family
  * ([[SignatureStore]] for MinHash signatures,
  * [[TextAnalysis.TokenizerStore]] for BPE merge rules).
  *
  * Why: at 100 TB an ANN index is trained ONCE (two full-corpus k-means
  * scans plus a driver-side rebuild) and then served by every query that
  * probes it; the always-retrain form (`ann_ivf_trained`) re-pays the
  * training scans per invocation. The store persists the trained
  * parameters as a parquet artifact keyed by (source dir, shape), so the
  * apply path reads back nLists (or M×K) rows — a parameter-bounded read,
  * no k-means jobs at all (CentroidStoreSpec captures every executed plan
  * on the apply path and asserts none aggregates training sums).
  *
  * Fidelity: centroids/codewords are float32 end to end; parquet stores
  * the exact bits, so a stored-then-probed query is HASH-IDENTICAL to the
  * freshly-trained one (`ann_ivf_stored` / `ann_pq_stored` share the
  * trained oracles verbatim). Locally the artifacts live in a temp dir
  * for the life of the JVM; on a cluster they'd be catalog tables
  * maintained by the index-build job — same contract, longer-lived.
  */
object CentroidStore {

  // the shared build-once kernel (r15): two key spaces, two stores
  private val ivfStore = new graft.sources.ArtifactStore[(String, Int, Int)]("centroids_ivf")
  private val pqStore = new graft.sources.ArtifactStore[(String, Int)]("centroids_pq")

  private val ivfSchema = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("centroid", ArrayType(FloatType, containsNull = false))))

  private val pqSchema = StructType(Seq(
    StructField("m", IntegerType, nullable = false),
    StructField("code", IntegerType, nullable = false),
    StructField("codeword", ArrayType(FloatType, containsNull = false))))

  /** Trained IVF centroids for a source directory's embeddings table —
    * k-means runs on the FIRST request per (dir, nLists, iters) and the
    * resulting nLists rows persist as parquet; every later request is a
    * bounded read-back. Returned sorted by cell id, bit-identical to a
    * fresh [[Similarity.trainedCentroids]] run.
    */
  def ivfCentroids(
      spark: SparkSession, dir: String,
      nLists: Int = Similarity.IvfLists,
      iters: Int = Similarity.IvfTrainIters): Array[(Int, Array[Float])] = {
    val key = (dir, nLists, iters)
    val path = ivfStore.getOrBuild(key) { out =>
      val cents = Similarity.trainedCentroids(
        graft.Tables.embeddings(spark, dir), nLists, iters)
      val rows = cents.toSeq.map { case (i, v) => Row(i, v.toSeq) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), ivfSchema)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.schema(ivfSchema).parquet(path)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
  }

  /** SAMPLE-trained IVF centroids — the flavor `ann_ivfpq` composes
    * with PQ codebooks (Lloyd's over the [[ProductQuantization.TrainSampleN]]
    * prefix rather than the full corpus; bit-identical to the joint
    * trainer's cell loop per its docstring). Separate artifact key space
    * from [[ivfCentroids]] (full-corpus centroids differ).
    */
  def ivfSampleCentroids(
      spark: SparkSession, dir: String,
      nLists: Int = ProductQuantization.IvfLists,
      iters: Int = ProductQuantization.IvfIters): Array[(Int, Array[Float])] = {
    import org.apache.spark.sql.functions.col
    val key = (s"$dir#sample", nLists, iters)
    val path = ivfStore.getOrBuild(key) { out =>
      val cents = Similarity.trainedCentroids(
        graft.Tables.embeddings(spark, dir)
          .where(col("vec_id") < ProductQuantization.TrainSampleN),
        nLists, iters)
      val rows = cents.toSeq.map { case (i, v) => Row(i, v.toSeq) }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), ivfSchema)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.schema(ivfSchema).parquet(path)
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
  }

  /** Trained PQ codebooks for a source directory — same contract:
    * trained once per (dir, iters) on the standard
    * [[ProductQuantization.TrainSampleN]] prefix, persisted as M×K
    * parquet rows, read back bounded thereafter.
    */
  def pqCodebooks(
      spark: SparkSession, dir: String,
      iters: Int = ProductQuantization.TrainIters): ProductQuantization.Codebooks = {
    import org.apache.spark.sql.functions.col
    val key = (dir, iters)
    val path = pqStore.getOrBuild(key) { out =>
      val emb = graft.Tables.embeddings(spark, dir)
      val cb = ProductQuantization.trainCodebooks(
        emb.where(col("vec_id") < ProductQuantization.TrainSampleN), iters)
      val rows = for {
        m <- cb.indices
        k <- cb(m).indices
      } yield Row(m, k, cb(m)(k).toSeq)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), pqSchema)
        .write.mode("overwrite").parquet(out)
    }
    val rows = spark.read.schema(pqSchema).parquet(path).collect()
    val grouped = rows.groupBy(_.getInt(0))
    Array.tabulate(ProductQuantization.NumSubspaces) { m =>
      grouped.getOrElse(m, Array.empty[Row])
        .sortBy(_.getInt(1))
        .map(_.getSeq[Float](2).toArray)
    }
  }

  /** Times the IVF artifact for `key` has been TRAINED (not read) — the
    * spec's evidence that the apply path never retrains.
    */
  def ivfBuilds(dir: String, nLists: Int = Similarity.IvfLists,
      iters: Int = Similarity.IvfTrainIters): Int =
    ivfStore.builds((dir, nLists, iters))

  def pqBuilds(dir: String, iters: Int = ProductQuantization.TrainIters): Int =
    pqStore.builds((dir, iters))
}
