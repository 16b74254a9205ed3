package graft.formats

import java.io.ByteArrayInputStream

import scala.collection.mutable

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.arrow.vector.ipc.ArrowStreamReader

import graft.SparkSuite

/** K1: the Arrow IPC sink must produce a stream a stock Arrow reader can
  * consume, with the same rows the DataFrame held — the analogue of the
  * reference's `batches_to_ipc` (`/root/reference/oxbow/src/util.rs:10-18`).
  */
class ArrowIpcSpec extends SparkSuite {

  test("DataFrame -> IPC bytes -> Arrow reader round-trips rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "alpha", 1.5),
      (2L, "beta", -0.25),
      (3L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score")
      .orderBy("id")

    val ipc = org.apache.spark.sql.graftshim.ArrowShim.toIpcBytes(df,
      maxRecordsPerBatch = 2) // forces a multi-batch stream
    assert(ipc.nonEmpty)

    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(ipc), alloc)
    val got = mutable.ArrayBuffer.empty[(Long, String, Double)]
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 3)
      while (reader.loadNextBatch()) {
        val ids = root.getVector("id").asInstanceOf[BigIntVector]
        val names = root.getVector("name").asInstanceOf[VarCharVector]
        val scores = root.getVector("score").asInstanceOf[Float8Vector]
        (0 until root.getRowCount).foreach { i =>
          got += ((ids.get(i),
            if (names.isNull(i)) null else new String(names.get(i), "UTF-8"),
            scores.get(i)))
        }
      }
    } finally {
      reader.close()
      alloc.close()
    }
    assert(got.toSeq == Seq(
      (1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, null, 0.0)))
  }

  test("gate-sized query result survives the IPC round-trip byte-exactly") {
    // a second serialization of the same frame is byte-identical —
    // the sink is deterministic, so downstream content hashes are stable
    val df = spark.range(100).selectExpr("id", "id * 2 as dbl",
      "cast(id as string) as s")
    val a = org.apache.spark.sql.graftshim.ArrowShim.toIpcBytes(df)
    val b = org.apache.spark.sql.graftshim.ArrowShim.toIpcBytes(df)
    assert(a.sameElements(b))
    // and the reader sees all 100 rows
    val alloc = new RootAllocator(Long.MaxValue)
    val reader = new ArrowStreamReader(new ByteArrayInputStream(a), alloc)
    var n = 0
    try {
      val root = reader.getVectorSchemaRoot
      while (reader.loadNextBatch()) n += root.getRowCount
    } finally { reader.close(); alloc.close() }
    assert(n == 100)
  }
}
