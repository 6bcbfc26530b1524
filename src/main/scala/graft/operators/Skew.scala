package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salt the skewed (fact) side into `salt`
  * sub-keys and replicate the dimension side `salt` ways, so one hot key's
  * rows spread over `salt` tasks instead of one straggler. Results are
  * identical to the unsalted join — only the physical distribution changes.
  * (AQE's skew-join handles sort-merge skew adaptively; explicit salting is
  * the deterministic-plan alternative and works for any join type.)
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0)
    // salt assignment only affects placement, not results — any
    // per-row-distinct value works; spark_partition_id+offset is cheap
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
