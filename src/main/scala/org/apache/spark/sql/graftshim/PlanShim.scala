package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Internal-row plan plumbing the public API hides. Lives in the shim
  * namespace (like [[ArrowShim]]/[[ColumnShim]]) for `private[sql]`
  * access to the classic session.
  *
  * [[internalCreateDataFrame]] wraps an `RDD[InternalRow]` back into a
  * DataFrame WITHOUT the external-Row encode leg that
  * `session.createDataFrame(rdd, schema)` pays (Catalyst converters on
  * every field of every row). The resulting scan projects each row to
  * unsafe, so emitted rows may be reused buffers or
  * `GenericInternalRow`s — the standard operator contract. */
object PlanShim {

  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
