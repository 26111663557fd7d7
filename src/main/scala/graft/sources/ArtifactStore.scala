package graft.sources

/** Shared kernel of the session-persisted ARTIFACT stores — the
  * train-once/apply-everywhere seam's storage layer, extracted (r15)
  * from the four stores that each re-implemented it:
  * [[graft.operators.SignatureStore]] (MinHash signatures + content
  * groups), [[graft.operators.TokenizerStore]] (BPE merge rules),
  * [[graft.operators.CentroidStore]] (IVF centroids / PQ codebooks),
  * [[graft.operators.ModelStore]] (NB quality classifier).
  *
  * Contract: per key, `build` runs EXACTLY ONCE per JVM (ConcurrentHashMap
  * `computeIfAbsent` — concurrent first requests serialize and later ones
  * read the winner's artifact), writing parquet under an md5-named dir
  * inside one delete-on-exit temp root; every later request is a bounded
  * parquet read-back. The build counter is the spec hook behind the
  * never-retrains plan captures (CentroidStoreSpec / ModelStoreSpec).
  *
  * On a cluster these dirs would be catalog tables maintained by the
  * ingest/index-build job — same contract, longer-lived. A new store is
  * ~10 lines: instantiate with a name, call [[getOrBuild]] with a writer,
  * read back with an explicit schema (so an empty corpus round-trips —
  * an empty parquet write leaves no footer to infer from).
  */
final class ArtifactStore[K](name: String) {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[K, String]()
  private val buildCounts =
    new java.util.concurrent.ConcurrentHashMap[K, Integer]()

  private lazy val root = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$name")
    graft.streaming.EventStreams.deleteRecursivelyOnExit(p)
    p
  }

  /** The artifact dir for `key`: on the FIRST call per key, `build(dir)`
    * runs and must write the artifact there; later calls return the path
    * without building.
    */
  def getOrBuild(key: K)(build: String => Unit): String =
    built.computeIfAbsent(key, k => {
      buildCounts.merge(k, 1, (a, b) => Integer.valueOf(a.intValue + b.intValue))
      val out = root.resolve(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$name:$k".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString).toString
      build(out)
      out
    })

  /** Times `key` has been BUILT (not read) — the no-retrain spec hook. */
  def builds(key: K): Int =
    Option(buildCounts.get(key)).fold(0)(_.intValue)
}
