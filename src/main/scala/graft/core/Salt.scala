package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §4 / builder mandate:
  * "salting for skew"). A handful of mukeys can carry a huge share of a
  * national fact table (urban survey areas); a plain equi-join puts each
  * hot key in one reducer. Salting spreads a hot key across `salts`
  * partitions: the fact side gets a deterministic salt derived from a
  * high-cardinality column, the dim side is replicated per salt.
  * Complements AQE skew-join (which only splits post-shuffle files). */
object Salt {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      spreadBy: Column, joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(spreadBy), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
