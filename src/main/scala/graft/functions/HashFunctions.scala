package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hash primitives for dedup / LSH.
  *
  * Everything derives from md5 (bit-identical in every engine) rather than
  * Spark's murmur3 `hash()` (whose seed/implementation is Spark-private and
  * not reproducible in an external oracle). 15 hex chars = 60 bits, always
  * a positive Long. All of these are built-in codegen'd expressions — no
  * UDFs, so they stay inside whole-stage codegen and cost one md5 per call.
  *
  * A seeded family {h_i} is needed for MinHash: h_i(x) = md5(i ++ ":" ++ x).
  */
object HashFunctions {

  /** 60-bit positive hash of a string column. */
  def md5Long(c: Column, seed: Int = 0): Column =
    conv(substring(md5(concat(lit(seed.toString), lit(":"), c)), 1, 15), 16, 10)
      .cast("long")

  /** 32-bit hash (low 32 bits of [[md5Long]]), for SimHash bit sampling. */
  def md5Int32(c: Column, seed: Int = 0): Column =
    md5Long(c, seed).bitwiseAND(lit(0xFFFFFFFFL))

  /** MinHash signature entry i: min over the element hashes of a string
    * array; null for an empty array (caller filters those out of LSH).
    */
  def minhash(elems: Column, seed: Int): Column =
    array_min(transform(elems, e => md5Long(e, seed)))

  /** Two INDEPENDENT 60-bit hashes from one seeded digest: the disjoint
    * hex ranges [1,15] and [17,31] of md5. Unlike an affine combination
    * (see the note in Dedup.signaturesFromShingled), disjoint digest bits
    * are genuinely independent — this halves the digests per element for
    * MinHash without weakening the family.
    */
  def md5LongHalves(c: Column, seed: Int): Column = {
    val d = md5(concat(lit(seed.toString), lit(":"), c))
    struct(
      conv(substring(d, 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(d, 17, 15), 16, 10).cast("long").as("h2"))
  }


  /** LSH band key over `rowsPerBand` consecutive minhash columns: two docs
    * land in the same bucket for band b iff all of that band's minhashes
    * agree. Hashing the concatenation keeps the key short for the shuffle.
    */
  def bandKey(minhashes: Seq[Column]): Column =
    md5(concat_ws(",", minhashes.map(_.cast("string")): _*))

  /** ±1 contribution of bit `b` of a 32-bit token hash — the per-token term
    * of a SimHash bit sum. `b` is a compile-time Int, so this stays a plain
    * codegen'd shift/mask. See [[graft.operators.Dedup.simhashSignatures]]
    * for the 32-way aggregation that assembles the signature.
    */
  def simhashBitTerm(hash32: Column, b: Int): Column =
    shiftright(hash32, b).bitwiseAND(lit(1L)) * 2 - 1

  /** Hamming distance between two SimHash signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
