package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for cluster-scale joins.
  *
  * AQE's runtime skew-join split (on by default in GraftSession) covers
  * sort-merge joins; explicit salting is the deterministic fallback for
  * the pathological case — a join key whose hottest value floods one
  * partition (the reference faces the same issue in its partitioned
  * hash joins, omniscidb/QueryEngine partitioned GroupBy/Join).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against a `small` side.
    *
    * The big side gets a deterministic salt in [0, salt) derived from
    * `saltBy` (a column that varies within a join key — e.g. a line
    * number or unique id); the small side is replicated `salt` ways.
    * Same results as `big.join(small, keys)`, but the hot key's rows
    * spread over `salt` partitions instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int, saltBy: Column, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salt)))
    val s = small.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
