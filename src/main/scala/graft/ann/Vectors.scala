package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over Array[Float] embedding columns, as pure
  * Catalyst expression trees (`zip_with`/`aggregate`), so they run
  * codegen'd with no UDF/serialization cost.
  *
  * Elements are cast to double before arithmetic and accumulated
  * left-to-right, making the result deterministic across engines and
  * partitionings. */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
