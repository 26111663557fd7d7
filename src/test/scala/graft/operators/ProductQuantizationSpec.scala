package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizationSpec extends SparkSpec {

  private lazy val emb = graft.Tables.embeddings(spark, sf("sf0.001"))

  test("codes are dense in [0, K) across every subspace") {
    val cb = ProductQuantization.trainCodebooks(emb)
    val codes = ProductQuantization.encode(emb, cb)
    (0 until ProductQuantization.NumSubspaces).foreach { m =>
      val used = codes.select(element_at(col("codes"), m + 1)).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(used.subsetOf((0 until ProductQuantization.NumCodes).toSet), s"m=$m: $used")
      // after training, the code space is actually used (not all one code)
      assert(used.size >= 2, s"subspace $m collapsed to $used")
    }
  }

  test("fused IVF+codebook training is bit-identical to the separate loops") {
    import org.apache.spark.sql.functions._
    val sample = emb.where(col("vec_id") < ProductQuantization.TrainSampleN)
    val (fusedCents, fusedCb) = ProductQuantization.trainIvfAndCodebooks(sample, 8, 2)
    val cents = Similarity.trainedCentroids(sample, 8, 2)
    val cb = ProductQuantization.trainCodebooks(sample)
    // the joint-keyed round + driver marginalization must reproduce every
    // float BIT of both separately-trained states (integer sums re-sum to
    // the same totals under any grouping; pinned division order)
    assert(fusedCents.map(_._1) === cents.map(_._1))
    fusedCents.zip(cents).foreach { case ((i, a), (_, b)) =>
      assert(a.toSeq === b.toSeq, s"centroid $i diverged")
    }
    (0 until ProductQuantization.NumSubspaces).foreach { m =>
      (0 until ProductQuantization.NumCodes).foreach { k =>
        assert(fusedCb(m)(k).toSeq === cb(m)(k).toSeq, s"codebook ($m, $k) diverged")
      }
    }
  }

  test("ADC + exact rerank recovers most of the exact top-5 (recall@5)") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, 10, 5))
    val reranked = pairs(ProductQuantization.pqTopK(emb, 5, 10))
    val recall = (exact intersect reranked).size.toDouble / exact.size
    println(s"PQ reranked recall@5 = $recall")
    assert(recall >= 0.5, s"reranked recall was $recall")
    // pure ADC (no rerank): an 8-byte sketch of a 256-byte vector — far
    // better than chance (5/499 ~ 1%) is the claim, not near-exactness
    val adc = pairs(ProductQuantization.pqTopK(emb, 5, 10, rerankDepth = 0))
    val adcRecall = (exact intersect adc).size.toDouble / exact.size
    println(s"PQ pure-ADC recall@5 = $adcRecall")
    assert(adcRecall >= 0.1, s"pure-ADC recall was $adcRecall")
  }

  test("IVF-ADC composition: recall on a clustered corpus >= flat PQ, and no exhaustive scan") {
    import spark.implicits._
    // the same 8-cluster fixture as SimilaritySpec's k-means case: tight
    // clusters on near-orthogonal axes, first-8 ids all inside cluster 0
    // (the degenerate seeding real clustered corpora produce)
    val rnd = new scala.util.Random(42)
    val axes = Array.tabulate(8) { c =>
      Array.tabulate(16)(d => if (d == 2 * c || d == 2 * c + 1) 1.0f else 0.0f)
    }
    val vecs = (0 until 256).map { id =>
      val c = if (id < 8) 0 else id % 8
      (id.toLong, axes(c).map(x => x + 0.1f * rnd.nextFloat()))
    }
    val cdf = vecs.toDF("vec_id", "embedding")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(cdf, 10, 5))
    def recall(approx: Set[(Long, Long)]): Double =
      (exact intersect approx).size.toDouble / exact.size
    val flat = recall(pairs(ProductQuantization.pqTopK(cdf, 5, 10)))
    val ivfpq = recall(pairs(ProductQuantization.ivfPqTopK(cdf, 5, 10)))
    println(s"clustered-corpus recall@5: flat-PQ=$flat ivf-PQ=$ivfpq")
    // trained cells put each query's own cluster in its probe set, so
    // pruning 5/8 of the corpus must not cost recall vs the flat scan
    assert(ivfpq >= flat, s"ivfpq=$ivfpq < flat=$flat")
    assert(ivfpq >= 0.9, s"ivfpq recall was $ivfpq")
  }

  test("IVF-ADC scores only the probed cells' candidates (the 100 TB term)") {
    import org.apache.spark.sql.functions._
    // measure the candidate-pair count the ADC scan touches: flat PQ
    // scores queries x (n-1); IVF-ADC scores only probed-cell members —
    // at bench SF the training loops dominate wall-clock, so THIS is the
    // scale-side quantity to pin (it is what grows with the corpus)
    val cents = Similarity.trainedCentroids(emb,
      ProductQuantization.IvfLists, ProductQuantization.IvfIters)
    val assigned = emb.where(col("embedding").isNotNull)
      .select(col("vec_id"),
        Similarity.bestCellOf(cents)(col("embedding")).as("cell"))
    val probes = emb.where(col("embedding").isNotNull && col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        explode(Similarity.probeCellsOf(cents, ProductQuantization.IvfProbe)(
          col("embedding"))).as("cell"))
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("query_id")).count()
    val n = emb.where(col("embedding").isNotNull).count()
    val flat = 10L * (n - 1)
    println(s"ADC candidate pairs: ivf-pq=$scored flat=$flat (${scored.toDouble / flat}x)")
    assert(scored < flat * 6 / 10,
      s"IVF probe pruned too little: $scored of $flat pairs scored")
  }

  test("IVF-ADC on the driver corpus agrees with flat PQ within the pruning budget") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb, 10, 5))
    val ivfpq = pairs(ProductQuantization.ivfPqTopK(emb))
    val recall = (exact intersect ivfpq).size.toDouble / exact.size
    println(s"driver-corpus IVF-PQ recall@5 = $recall")
    // probes 3 of 8 cells AND scans codes, not floats — far better than
    // chance is the claim (the exact-vs-ADC gap is measured above)
    assert(recall >= 0.3, s"ivf-pq recall was $recall")
  }

  test("approximate cosine tracks exact cosine (rank correlation on one query)") {
    // the ADC score of the reconstruction should order vectors roughly
    // like the true cosine: check the approx-top-50's mean exact cosine
    // beats the corpus mean by a wide margin
    val approxTop = ProductQuantization.pqTopK(emb, 50, 1)
      .where(col("query_id") === 0).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet
    val cosines = Similarity.bruteForceTopK(emb, 1, 499)
      .where(col("query_id") === 0)
      .select(col("neighbor_id"), col("rank"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // mean exact-cosine RANK of the approx top-50 (lower = better)
    val meanRank = approxTop.toSeq.map(cosines(_)).sum.toDouble / approxTop.size
    assert(meanRank < 125.0, s"approx top-50 mean exact rank $meanRank (random ~250)")
  }
}
