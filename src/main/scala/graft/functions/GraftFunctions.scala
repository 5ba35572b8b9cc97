package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Column-level functions shared by the operator library.
  *
  * Everything here is built from `org.apache.spark.sql.functions._`
  * primitives (codegen'd, no Scala UDFs in the hot path) and has an exact
  * DuckDB rendering in [[graft.oracle.DuckSql]] so every operator that uses
  * them stays hash-checkable against the driver's DuckDB oracle.
  */
object GraftFunctions {

  /** Portable 60-bit hash: first 15 hex chars of md5, read base-16.
    * Positive, fits a signed 64-bit integer, and computable identically in
    * DuckDB ([[graft.oracle.DuckSql.hash60]]). Used for dedup signatures,
    * LSH bucketing and fingerprints; being md5-based it is stable across
    * JVMs/partitionings (unlike `hash()`/`xxhash64` whose seeds differ
    * between engines).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash family member i (minhash permutations,
    * LSH hyperplanes). h_i(x) = hash60(i ':' x).
    */
  def hash60Seeded(seed: Int, c: Column): Column =
    hash60(concat(lit(seed.toString), lit(":"), c.cast("string")))

  /** Driver-side twin of [[hash60]] for deriving deterministic constants
    * (e.g. LSH hyperplane weights) without per-row hashing.
    */
  def hash60Scala(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Lowercased whitespace tokens, empties removed. Matches
    * DuckSql.tokens exactly (same regex class, same empty-filter).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Distinct word n-gram shingles over [[tokens]]. Docs with fewer than n
    * tokens yield an empty array.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    val grams = transform(
      sequence(lit(0), size(t) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))
    when(size(t) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Token count (whitespace segmentation). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Exact cosine similarity between two float/double array columns,
    * computed as an in-order left fold in double precision — the identical
    * arithmetic DuckSql.cosine emits, so results are bit-exact across
    * engines. Higher-order functions evaluate inside the JVM row pipeline
    * (no shuffle, no UDF serialization).
    */
  def cosine(a: Column, b: Column): Column = {
    def fold(v: Column) = aggregate(v, lit(0.0), (acc, x) => acc + x)
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val dot = fold(zip_with(ad, bd, (x, y) => x * y))
    val na = fold(transform(ad, x => x * x))
    val nb = fold(transform(bd, x => x * x))
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Dot product (in-order double fold; parity with DuckSql.dot). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(transform(a, _.cast("double")), transform(b, _.cast("double")),
      (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
}
