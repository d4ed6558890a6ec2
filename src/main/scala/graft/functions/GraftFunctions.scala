package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration for graft's native Catalyst expressions, making them
  * callable from SQL / expr() strings. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        require(exprs.length == 2, s"cosine_sim expects 2 arguments, got ${exprs.length}")
        org.apache.spark.sql.graft.CosineSim(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => {
        require(exprs.length == 1, s"nfc_normalize expects 1 argument, got ${exprs.length}")
        org.apache.spark.sql.graft.NfcNormalize(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "point_in_polygon", exprs => {
        require(exprs.length == 4,
          s"point_in_polygon expects 4 arguments, got ${exprs.length}")
        org.apache.spark.sql.graft.PointInPolygon(
          exprs.head, exprs(1), exprs(2), exprs(3))
      }, "built-in")
  }
}
