package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting handles most skew at runtime; salting is the
  * explicit form for the pathological case (one key = 30% of the table)
  * where even split shuffle blocks overwhelm a reducer. Semantics are
  * identical to a plain inner join:
  *
  *  - fact side: deterministic salt in [0, n) hashed from the whole row
  *    (xxhash64 — no RNG, reruns are stable)
  *  - dim side: each row replicated n times, one per salt value
  *  - join on (key, salt) → the skewed key's rows spread across n reducers
  *
  * Cost model: replicates the smaller side n×, so choose n ≈ (largest key
  * count / target partition rows); only worthwhile when the dim side is
  * orders of magnitude smaller than the skewed fact side.
  */
object SkewJoin {

  def saltedInnerJoin(
      fact: DataFrame, dim: DataFrame, key: String, nSalts: Int = 16): DataFrame = {
    val factSalted = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(nSalts)).cast("int"))
    val dimSalted = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    factSalted.join(dimSalted, Seq(key, "__salt")).drop("__salt")
  }
}
