package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's one extension point, re-expressed on Spark's typed API:
  * `DoMap(mapF: (doc, content) => [KeyValue])` and
  * `DoReduce(reduceF: (key, values) => value)`
  * (reference `mapreduce/mapreduce.go:59,88`, bound at
  * `worker/worker.go:59,63`).
  *
  * Semantics preserved exactly: the reducer sees *all* values for a key
  * (`groupByKey.mapGroups`). When the reduce function is associative +
  * commutative, use [[mapReduceAssociative]] instead — `reduceGroups` plans a
  * map-side partial reduce (Spark's `ReduceAggregator`), which is the
  * reference's in-mapper combiner (`mapreduce.go:32-44`) generalized. At
  * 100 TB the associative path shuffles one pre-reduced value per key per
  * partition; the general path shuffles every pair — prefer the former.
  *
  * Shuffle partitioning (reference FNV-32a `ihash % nReduce`,
  * `mapreduce.go:24-28`) maps to Spark's `HashPartitioning` — hash identity
  * is not observable, only the induced grouping is (SURVEY §2.1 #7).
  */
object MapReduce {

  /** General form: reduceF sees the full value list per key. */
  def mapReduce[K: Encoder, V](
      input: Dataset[(String, String)],
      mapF: (String, String) => IterableOnce[(K, V)],
      reduceF: (K, Iterator[V]) => V)(implicit
      kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    input
      .flatMap { case (doc, content) => mapF(doc, content).iterator.toSeq }
      .groupByKey(_._1)
      .mapGroups((k, it) => (k, reduceF(k, it.map(_._2))))

  /** Associative/commutative fast path with map-side partial reduction. */
  def mapReduceAssociative[K: Encoder, V](
      input: Dataset[(String, String)],
      mapF: (String, String) => IterableOnce[(K, V)],
      combine: (V, V) => V)(implicit
      kvEnc: Encoder[(K, V)]): Dataset[(K, V)] =
    input
      .flatMap { case (doc, content) => mapF(doc, content).iterator.toSeq }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** Text files → `(path, content)` pairs, mirroring `DoMap`'s
    * `(document, contents)` arguments (reference `mapreduce.go:31,60`).
    * `wholetext` keeps one row per file like the reference's one-map-task-
    * per-file model (`master/master.go:50-62`); at scale, drop `wholetext`
    * and let Spark split files into line-level records instead.
    */
  def textInput(spark: SparkSession, paths: Seq[String]): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read
      .option("wholetext", "true")
      .text(paths: _*)
      .select(input_file_name().as("doc"), col("value").as("content"))
      .as[(String, String)]
  }

  /** Inverted index on the GENERAL path (reducer sees every value for a
    * key, order-dependent result — not expressible as an associative
    * combine): word → comma-joined sorted distinct doc ids. This is the
    * kind of job the reference's `reduceF(key, values)` contract exists
    * for (reference `mapreduce/mapreduce.go:88`).
    *
    * Doc ids are opaque strings and sort LEXICOGRAPHICALLY — the job must
    * work on [[textInput]], whose ids are file paths, as well as numeric
    * table ids (where lexicographic order is the string order of the id,
    * not numeric order — the oracle mirrors this with a VARCHAR sort).
    */
  def invertedIndexJob(input: Dataset[(String, String)])(implicit
      spark: SparkSession): Dataset[(String, String)] = {
    import spark.implicits._
    val mapF: (String, String) => IterableOnce[(String, String)] = (doc, content) =>
      content.split("\\s+")
        .map(_.toLowerCase.replaceAll("^[.,!?:;\"']+|[.,!?:;\"']+$", ""))
        .filter(_.nonEmpty)
        .distinct
        .map(w => (w, doc))
    val reduceF: (String, Iterator[String]) => String = (_, docs) =>
      docs.toSeq.distinct.sorted.mkString(",")
    mapReduce[String, String](input, mapF, reduceF)
  }

  /** The reference's word-count MapF/ReduceF pair on the generic API
    * (reference `mapreduce/mapreduce.go:31-56`), including the in-mapper
    * combine (counts emitted once per distinct word per document).
    */
  def wordCountJob(input: Dataset[(String, String)])(implicit
      spark: SparkSession): Dataset[(String, Long)] = {
    import spark.implicits._
    val mapF: (String, String) => IterableOnce[(String, Long)] = (_, content) => {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      content.split("\\s+").foreach { raw =>
        val w = raw.toLowerCase.replaceAll("^[.,!?:;\"']+|[.,!?:;\"']+$", "")
        if (w.nonEmpty) counts.update(w, counts.getOrElse(w, 0L) + 1L)
      }
      counts
    }
    mapReduceAssociative[String, Long](input, mapF, _ + _)
  }
}
