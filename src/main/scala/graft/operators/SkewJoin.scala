package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join — the manual fallback when AQE's skew-join
  * splitting (enabled by default in GraftSession) isn't available or a
  * specific hot key is known. The big side gets a deterministic salt
  * derived from a discriminator column; the small side is replicated
  * `saltBuckets` times, so one hot key spreads over `saltBuckets`
  * reducers instead of one straggler task. Result-identical to the plain
  * equi-join (asserted in spec).
  *
  * At 100 TB: use for power-law keys (user_id, domain) where one key can
  * exceed a single executor's memory; AQE handles the moderate cases.
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, discriminator: String, saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(hash(col(discriminator)), lit(saltBuckets)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") && col(bigKey) === col(smallKey))
      .drop("__salt")
  }
}
