package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Text primitives for the LLM-data-pipeline operators (dedup, quality,
  * language-ID, fingerprinting). All pure `Column` expression trees —
  * tokenization, shingling, hashing and signatures stay inside
  * whole-stage codegen; nothing here is a UDF.
  */
object TextFunctions {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Deterministic 60-bit hash from md5 — reproducible in any engine
    * that has md5 (the DuckDB oracle parses the same 15 hex chars).
    * 60 bits keeps the value comfortably inside a signed 64-bit long.
    */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** xxhash64-based hash — the fast path for production-scale dedup
    * (single pass, codegen'd, no string md5 hex round-trip).
    */
  def fastHash(c: Column): Column = xxhash64(c)

  /** Distinct word n-gram shingles ("a b c" strings). Documents shorter
    * than n tokens yield an empty set. Lowers to the codegen'd
    * [[ShinglesExpr]] — value-identical to the old
    * `array_distinct(transform(sequence(...), i => array_join(slice(
    * toks, i, n), " ")))` lambda chain (same joined strings, same
    * first-occurrence distinct order, same empty-set fallbacks), one
    * loop per row instead of three interpreted lambdas per shingle.
    */
  def shingles(text: Column, n: Int): Column =
    Native.shingles(tokens(text), n)

  /** MinHash signature: `numHashes` independent min-hashes of the shingle
    * set, hash i of shingle s = hashFn(i || ':' || s).
    */
  def minhashSignature(
      shingleSet: Column,
      numHashes: Int,
      hashFn: Column => Column = md5Hash60): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleSet,
        s => hashFn(concat(h.cast("string"), lit(":"), s)))))

  /** 64-bit SimHash over the token multiset: bit b of the output is set
    * when the sum of (+1/-1) votes from each token's hash bit b is
    * positive.
    */
  def simhash64(toks: Column, hashFn: Column => Column = fastHash): Column = {
    val hashes = transform(toks, t => hashFn(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => {
        val votes = aggregate(hashes, lit(0L),
          (v, h) => v + when(
            call_function("shiftright", h, b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L))
        acc + when(votes > 0, call_function("shiftleft", lit(1L), b))
          .otherwise(lit(0L))
      })
  }

  /** Hamming distance between two simhashes (near-dup test at scale). */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Jaccard similarity of two pre-distinct shingle arrays — exact
    * |A∩B| / |A∪B| as a double.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Exact-dedup fingerprint: md5 of the whitespace-normalized,
    * lower-cased text (document fingerprinting, canonical form).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(tokens(text), " "))

  /** Rolling polynomial hash over tokens (order-sensitive fingerprint,
    * base-31 Horner form). Modular at 1e9+7 — ANSI mode forbids silent
    * 64-bit wraparound, and the modulus keeps every intermediate far
    * from overflow.
    */
  def rollingHash(toks: Column, hashFn: Column => Column = fastHash): Column = {
    val m = lit(1000000007L)
    aggregate(toks, lit(0L),
      (acc, t) => pmod(acc * lit(31L) + pmod(hashFn(t), m), m))
  }
}
