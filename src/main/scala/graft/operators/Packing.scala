package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the LLM-pretraining batch layout step: concatenate
  * the corpus in deterministic doc_id order and slice the token stream
  * into fixed-length training examples (`SeqLen` tokens), documents
  * crossing example boundaries (the standard concat-and-chunk regime; the
  * alternative, per-example greedy bin packing, trades boundary loss for
  * an inherently sequential packing order that cannot be replayed
  * bit-for-bit by an external engine).
  *
  * The load-bearing piece is the DISTRIBUTED PREFIX SUM that assigns every
  * document its global token offset without a global sort or a
  * single-partition window:
  *
  *   1. per-doc token counts (scan-speed, whitespace tokenizer — the same
  *      `ws_tokens` contract as [[TextAnalysis.tokenCounts]]);
  *   2. docs group into contiguous id blocks (`doc_id div OffsetBucket`);
  *      per-block sums are ONE map-side-combined hash-agg;
  *   3. block-level exclusive cumsum — a window over |corpus|/bucket rows
  *      (the only ordered step, 100k rows at 100 TB with a 10^6 bucket —
  *      and the pattern nests to three levels if that ever grows);
  *   4. intra-block exclusive cumsum — windows PARTITIONED by block, fully
  *      parallel — plus the broadcast block offsets.
  *
  * Every number is an exact integer, so offsets, spans, and chunk stats
  * replay bit-for-bit in the DuckDB oracle.
  */
object Packing {

  /** Tokens per packed training example. */
  val SeqLen = 512

  /** Documents per offset block of the two-level prefix sum. At this
    * test scale that makes ~8 blocks at sf0.01; at 100 TB set ~10^6 so
    * the block-level window stays ~10^5 rows.
    */
  val OffsetBucket = 64L

  /** (doc_id, n_tok, tok_start): each document's token count and exclusive
    * global token offset in doc_id concatenation order — the two-level
    * prefix sum described above.
    */
  def docOffsets(documents: DataFrame, bucket: Long = OffsetBucket): DataFrame =
    prefixOffsets(graft.Parallelism.ensure(documents).select(
      col("doc_id"),
      expr(s"doc_id div ${bucket}L").as("bkt"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok")))

  /** The two-level distributed prefix sum over a (doc_id, bkt, n_tok)
    * frame — shared by the raw-corpus offsets and the mixture-schedule
    * composition ([[scheduleOffsets]]).
    */
  private def prefixOffsets(perDoc: DataFrame): DataFrame = {
    val blockSums = perDoc.groupBy("bkt").agg(sum("n_tok").as("b_tok"))
    // exclusive cumsum over blocks: the ONLY global-ordered window, sized
    // |corpus| / bucket
    val blockOffsets = blockSums
      .withColumn("b_off",
        coalesce(
          sum("b_tok").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("bkt", "b_off")
    val intra = Window.partitionBy("bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("i_off", coalesce(sum("n_tok").over(intra), lit(0L)))
      .join(broadcast(blockOffsets), "bkt")
      .select(col("doc_id"), col("n_tok"),
        (col("b_off") + col("i_off")).as("tok_start"))
  }

  /** Packing offsets for a MIXED corpus — [[docOffsets]] composed with
    * [[Sampling.mixtureSchedule]]: the mixed training stream concatenates
    * documents in doc_id order with each document's `n_repeats` copies
    * adjacent, so a document contributes `n_toks × n_repeats` consecutive
    * tokens and its stream offset is the exclusive prefix sum of that
    * product. The repeats NEVER materialize — the schedule stays linear in
    * the corpus and the same two-level prefix sum assigns offsets, which
    * is the whole point of scheduling repeats as counts rather than rows.
    * Output: (doc_id, n_tok (mixed = n_toks×n_repeats), tok_start).
    */
  def scheduleOffsets(schedule: DataFrame, bucket: Long = OffsetBucket): DataFrame =
    prefixOffsets(schedule.select(
      col("doc_id"),
      expr(s"doc_id div ${bucket}L").as("bkt"),
      (col("n_toks") * col("n_repeats")).as("n_tok")))

  /** Per-document packed spans: which training examples (chunks) each
    * document's tokens land in. `n_tok >= 1` always (the whitespace
    * tokenizer yields [""] for empty text, same as `ws_tokens`), so every
    * document has a well-defined [first_chunk, last_chunk].
    */
  def packedDocSpans(documents: DataFrame, seqLen: Int = SeqLen): DataFrame =
    docOffsets(documents)
      .select(col("doc_id"), col("n_tok"), col("tok_start"),
        expr(s"tok_start div $seqLen").as("first_chunk"),
        expr(s"(tok_start + n_tok - 1) div $seqLen").as("last_chunk"))

  /** Per-chunk (training-example) rollup: how many documents overlap the
    * example, how many START in it, and its token fill (= seqLen for all
    * but the final chunk — the invariant PackingSpec asserts). One explode
    * of ≤ (n_tok/seqLen + 1) rows per doc, one keyed hash-agg.
    */
  def packedChunkStats(documents: DataFrame, seqLen: Int = SeqLen): DataFrame =
    packedDocSpans(documents, seqLen)
      .select(col("doc_id"), col("n_tok"), col("tok_start"),
        explode(expr("sequence(first_chunk, last_chunk)")).as("chunk_id"))
      .groupBy("chunk_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("tok_start") >= col("chunk_id") * seqLen, 1L).otherwise(0L))
          .as("n_starts"),
        sum(
          least(col("tok_start") + col("n_tok"), (col("chunk_id") + 1) * seqLen) -
            greatest(col("tok_start"), col("chunk_id") * seqLen))
          .as("n_tokens"))

  /** NO-SPLIT sequence packing — the bin-packing alternative to
    * concat-and-chunk (Krell et al. 2022, "Efficient Sequence Packing
    * without Cross-contamination"): every document that fits lands WHOLE
    * in exactly one `seqLen` bin, so no training example ever straddles a
    * document boundary. The algorithm is harmonic-class shelf packing
    * (the interval scheme of Lee & Lee 1985's Harmonic algorithm): a
    * document of `n_tok` tokens joins class `m = seqLen div n_tok`, and
    * any `m` documents of class m sum to ≤ m·(seqLen div m) ≤ seqLen —
    * so bins are simply consecutive rank-groups of m class-mates, and
    * every bin's fill exceeds m·(seqLen div (m+1)) > seqLen·m/(m+1).
    * Chosen over first-fit-decreasing deliberately: FFD's bin state is a
    * sequential fold (driver-resident and not oracle-replayable without
    * recursion), while the harmonic form is pure relational algebra —
    * closed-form, bit-replayable in SQL, and embarrassingly parallel —
    * at a bounded waste premium that [[packWaste]]'s card measures
    * against the naive row.
    *
    * Documents longer than `seqLen` cannot pack without splitting; they
    * are surfaced with `fits = false` and NULL placement (the
    * concat-and-chunk path [[packedDocSpans]] is where they belong).
    *
    * Scale shape — NO corpus-scale ordered step anywhere: within-class
    * rank is doc_id order decomposed by the [[docOffsets]] two-level
    * idiom (per-(class, id-block) row_number windows — partitions bounded
    * by block size — plus an ordered cumsum over the (class, block) COUNT
    * frame); bin offsets are windows over (class, bin) partitions of ≤ m
    * ≤ seqLen rows; the global bin numbering is a cumsum over the
    * ≤|classes|-row (~2√seqLen) per-class bin-count frame, broadcast
    * back. Output: one row per document (doc_id, n_tok, fits, m_class,
    * bin_id, bin_slot, tok_offset).
    */
  def packBestFit(documents: DataFrame, seqLen: Int = SeqLen,
      bucket: Long = OffsetBucket): DataFrame = {
    val base = graft.Parallelism.ensure(documents).select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
    val fit = base.where(col("n_tok") <= seqLen)
      .withColumn("m", expr(s"${seqLen}L div n_tok"))
      .withColumn("bkt", expr(s"doc_id div ${bucket}L"))
    // within-class rank in doc_id order, two-level: intra-block rank +
    // block base (partitions stay block-bounded at any corpus size)
    val wIntra = Window.partitionBy("m", "bkt").orderBy("doc_id")
    val blockCounts = fit.groupBy("m", "bkt").agg(count(lit(1)).as("c"))
    val wBlocks = Window.partitionBy("m").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = blockCounts
      .withColumn("c_off", coalesce(sum("c").over(wBlocks), lit(0L)))
      .select("m", "bkt", "c_off")
    val ranked = fit
      .withColumn("ir", row_number().over(wIntra).cast("long") - 1L)
      .join(blockOffsets, Seq("m", "bkt"))
      .withColumn("r", col("c_off") + col("ir"))
      .withColumn("b", expr("r div m"))
      .withColumn("slot", expr("r % m"))
    // token offset inside the bin: a window over ≤ m rows per partition
    val wBin = Window.partitionBy("m", "b").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = ranked
      .withColumn("tok_offset", coalesce(sum("n_tok").over(wBin), lit(0L)))
    // global bin ids: ceil(class count / m) bins per class, exclusive
    // cumsum over the ~2√seqLen-row class frame
    val classBins = fit.groupBy("m")
      .agg(expr("(count(1) - 1) div m + 1").as("n_bins"))
    val wCls = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    val classBase = classBins
      .withColumn("bin_base", coalesce(sum("n_bins").over(wCls), lit(0L)))
      .select("m", "bin_base")
    placed.join(broadcast(classBase), Seq("m"))
      .select(col("doc_id"), col("n_tok"), lit(true).as("fits"),
        col("m").as("m_class"), (col("bin_base") + col("b")).as("bin_id"),
        col("slot").as("bin_slot"), col("tok_offset"))
      .unionByName(base.where(col("n_tok") > seqLen)
        .select(col("doc_id"), col("n_tok"), lit(false).as("fits"),
          lit(null).cast("long").as("m_class"),
          lit(null).cast("long").as("bin_id"),
          lit(null).cast("long").as("bin_slot"),
          lit(null).cast("long").as("tok_offset")))
  }

  /** Shards for [[shardManifest]] — small here so every shard is populated
    * at sf0.001; a real export sizes shards to the file-size target
    * (n_tokens × bytes/token ≈ the parquet/record-io file size).
    */
  val ShardCount = 8
  val ShardSeed = 17

  /** Training-export shard manifest — the LAST pipeline step before the
    * trainer: every document is assigned a shard by content-independent
    * keyed hash (`md5₆₀(seed:doc_id) mod nShards`) and ordered WITHIN its
    * shard by that same hash — a deterministic global shuffle (Fisher-
    * Yates-quality mixing without any RNG state), so consecutive training
    * examples are decorrelated while remaining bit-reproducible across
    * engines, partitionings, and re-runs. The manifest row per shard
    * carries what a trainer (and an auditor) needs: document count, token
    * total, an order-independent XOR content digest (the
    * [[Sketches.tableDigest]] contract — any post-manifest corruption or
    * drop flips the digest), and the deterministic head of the shard's
    * training order.
    *
    * Shape: one scan with per-row hashes, one |nShards|-row hash-agg.
    * The within-shard ORDER is declared by the (h, doc_id) sort key and
    * costs nothing here (min_by suffices for the manifest); the actual
    * export writes `repartition(nShards, shard).sortWithinPartitions(h,
    * doc_id)` — one shuffle, no global sort.
    */
  def shardManifest(documents: DataFrame,
      nShards: Int = ShardCount, seed: Int = ShardSeed): DataFrame = {
    val xorAgg = udaf(new graft.functions.Aggregators.XorDigest)
    graft.Parallelism.ensure(documents)
      .select(
        pmod(graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed),
          lit(nShards.toLong)).as("shard"),
        graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
        rowHash.as("rh"),
        col("doc_id"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tok").as("n_tokens"),
        xorAgg(col("rh")).as("digest"),
        min(struct(col("h"), col("doc_id"))).as("head"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("digest"),
        col("head.doc_id").as("first_doc"))
  }

  /** The per-row content hash the manifest digests and the verifier
    * recomputes — a pure function of the row's payload columns, so any
    * post-export corruption, drop, or duplication flips a shard digest.
    */
  private def rowHash = graft.functions.HashFunctions.md5Long(
    concat_ws("|", col("doc_id"), col("lang"), col("source"), md5(col("text"))))

  /** WRITE the sharded training export [[shardManifest]] predicts: one
    * shuffle (`repartition(nShards, shard)`) plus within-partition sort by
    * the deterministic (shard, h, doc_id) key, written `partitionBy(shard)`
    * so each shard is its own parquet directory in training order — the
    * exact "one shuffle, no global sort" plan the manifest's docstring
    * declares. Columns shipped: the document payload plus `h` (the order
    * key, kept so a reader can assert the order without recomputing it).
    */
  def writeShardedExport(documents: DataFrame, outDir: String,
      nShards: Int = ShardCount, seed: Int = ShardSeed): Unit =
    graft.Parallelism.ensure(documents)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed).as("h"),
        pmod(graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed),
          lit(nShards.toLong)).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** CLOSE THE LOOP: re-read a sharded export and verify it against the
    * manifest that predicted it — per shard, recompute the document count,
    * token total, XOR content digest, and head doc from the ACTUAL bytes
    * on disk (nothing is trusted from the export's own columns except the
    * payload they digest) and compare. Any corruption, dropped row, or
    * cross-shard misplacement flips at least one `*_match` flag — this is
    * the audit a 100 TB pipeline runs after every export job, at the cost
    * of one scan of the artifact plus an |nShards|-row join.
    */
  def verifyShardedExport(spark: org.apache.spark.sql.SparkSession,
      exportDir: String, manifest: DataFrame,
      nShards: Int = ShardCount, seed: Int = ShardSeed): DataFrame = {
    val xorAgg = udaf(new graft.functions.Aggregators.XorDigest)
    val recomputed = spark.read.parquet(exportDir)
      .select(
        pmod(graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed),
          lit(nShards.toLong)).as("shard"),
        graft.functions.HashFunctions.md5Long(col("doc_id").cast("string"), seed).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
        rowHash.as("rh"),
        col("doc_id"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("a_docs"),
        sum("n_tok").as("a_tokens"),
        xorAgg(col("rh")).as("a_digest"),
        min(struct(col("h"), col("doc_id"))).as("a_head"))
      .select(col("shard"), col("a_docs"), col("a_tokens"), col("a_digest"),
        col("a_head.doc_id").as("a_first_doc"))
    manifest.join(recomputed, Seq("shard"), "full_outer")
      .select(
        col("shard"),
        col("n_docs"), col("a_docs"),
        (col("n_docs") <=> col("a_docs")).as("docs_match"),
        (col("n_tokens") <=> col("a_tokens")).as("tokens_match"),
        (col("digest") <=> col("a_digest")).as("digest_match"),
        (col("first_doc") <=> col("a_first_doc")).as("head_match"))
  }

  /** Context lengths the padding-waste card reports. */
  val PackWasteLens: Seq[Long] = Seq(512L, 1024L, 2048L)

  /** PADDING-WASTE report — the economics that justify sequence packing:
    * for each candidate context length, the token overhead of naive
    * one-document-per-sequence batching (every doc padded up to a
    * multiple of L), of the no-split harmonic packing
    * ([[packBestFit]]; oversize docs fall back to the naive treatment),
    * and of the packed stream (only the final sequence pads), as integer
    * milli shares of the padded stream. At 100 TB the difference is the
    * GPU-hours bill; this card is how a pipeline picks L, chooses
    * between the no-split and chunked regimes, and proves packing pays.
    * `pad_bestfit ≤ pad_naive` always (a class's bins never outnumber
    * its docs), and `pad_packed` is the floor.
    *
    * Shape: ONE scan computing per-doc token counts exploded over the
    * |PackWasteLens| candidate lengths (3n rows), one map-side-combined
    * (L, class) hash-agg — ≤ ~2√L classes per L — then per-L rollups and
    * pure arithmetic on that tiny frame. Output: |PackWasteLens| rows.
    */
  def packWaste(documents: DataFrame): DataFrame = {
    val lensArr = PackWasteLens.map(l => lit(l)).toArray
    val perClass = graft.Parallelism.ensure(documents)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"),
        explode(array(lensArr: _*)).as("seq_len"))
      .select(col("seq_len"), col("n_tok"),
        // class -1 = oversize (naive multi-sequence padding applies)
        expr("CASE WHEN n_tok <= seq_len THEN seq_len div n_tok ELSE -1L END")
          .as("m"),
        expr("((n_tok + seq_len - 1) DIV seq_len) * seq_len - n_tok")
          .as("pad_doc"))
      .groupBy("seq_len", "m")
      .agg(count(lit(1)).as("cnt"), sum("n_tok").as("toks"),
        sum("pad_doc").as("pad_naive_cls"))
    perClass
      .groupBy("seq_len")
      .agg(
        sum("cnt").as("n_docs"),
        sum("toks").as("n_tokens"),
        sum("pad_naive_cls").as("pad_naive"),
        // harmonic bins: ceil(cnt/m) per fitting class; oversize docs pad
        // exactly as in the naive row
        (sum(when(col("m") >= 1L, expr("((cnt - 1) div m + 1) * seq_len - toks"))
          .otherwise(0L)) +
          sum(when(col("m") === -1L, col("pad_naive_cls")).otherwise(0L)))
          .as("pad_bestfit"))
      .withColumn("pad_packed", expr(
        "CASE WHEN n_tokens > 0 THEN " +
          "((n_tokens + seq_len - 1) DIV seq_len) * seq_len - n_tokens " +
          "ELSE 0 END"))
      .withColumn("waste_naive_milli", expr(
        "CASE WHEN n_tokens + pad_naive > 0 " +
          "THEN (pad_naive * 1000) DIV (n_tokens + pad_naive) ELSE 0 END"))
      .withColumn("waste_bestfit_milli", expr(
        "CASE WHEN n_tokens + pad_bestfit > 0 " +
          "THEN (pad_bestfit * 1000) DIV (n_tokens + pad_bestfit) ELSE 0 END"))
      .withColumn("waste_packed_milli", expr(
        "CASE WHEN n_tokens + pad_packed > 0 " +
          "THEN (pad_packed * 1000) DIV (n_tokens + pad_packed) ELSE 0 END"))
      .select("seq_len", "n_docs", "n_tokens", "pad_naive", "pad_bestfit",
        "pad_packed", "waste_naive_milli", "waste_bestfit_milli",
        "waste_packed_milli")
  }
}
