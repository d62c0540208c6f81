package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE's skew-join split (enabled in every session
  * this library builds). Salting is for the pathological case AQE can't fix:
  * one key so hot a single task would still own it after splitting. The big
  * side gets a deterministic salt from a unique column's hash; the small
  * side is replicated `salt` ways; the join key becomes (key, salt), so the
  * hot key spreads over `salt` tasks. Result set is identical to the
  * unsalted join.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int, bigUniqueCol: String): DataFrame = {
    require(salt > 0, "salt must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(col(bigUniqueCol)), lit(salt)).cast("int"))
    val s = small.withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
