package org.apache.spark.sql.graftshim

import java.io.ByteArrayOutputStream

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.util.ArrowUtils

/** Arrow IPC sink (SURVEY §2.2 K1): serialize a DataFrame's rows to a
  * single Arrow IPC stream byte array — the analogue of the reference's
  * `batches_to_ipc` (`/root/reference/oxbow/src/util.rs:10-18`) /
  * Python `to_ipc`. Driver-side collect; intended for result-sized
  * frames, not the 100 TB path (that's parquet). Lives in the shim
  * namespace for access to Spark's internal Arrow utilities. */
object ArrowShim {

  def toIpcBytes(df: DataFrame, maxRecordsPerBatch: Int = 1 << 16): Array[Byte] = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(df.schema, tz,
      errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val allocator = ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, allocator)
    try {
      val arrowWriter = ArrowWriter.create(root)
      val out = new ByteArrayOutputStream()
      val writer = new ArrowStreamWriter(root, null, out)
      writer.start()
      val rows = df.queryExecution.executedPlan.executeCollect()
      var i = 0
      while (i < rows.length) {
        val batchEnd = math.min(i + maxRecordsPerBatch, rows.length)
        while (i < batchEnd) { arrowWriter.write(rows(i)); i += 1 }
        arrowWriter.finish()
        writer.writeBatch()
        arrowWriter.reset()
      }
      writer.end()
      out.toByteArray
    } finally {
      root.close()
      allocator.close()
    }
  }
}
