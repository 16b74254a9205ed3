package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Physical-layout helpers for repeated large-scale joins/aggregations.
  *
  * Bucketing is the 100 TB answer to "this join runs every day on the
  * same key": both sides written with `bucketBy(n, key)` + `sortBy` are
  * hash-partitioned on disk, so Catalyst plans the join with ZERO
  * exchanges — no shuffle of either side, ever again. The one-time write
  * cost amortizes across every downstream join/groupBy on the key.
  * (`PlanAuditSpec` pins the no-Exchange plan.)
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted saved table. Bucket
    * count should match downstream parallelism (buckets are the minimum
    * task granularity for bucket-preserving reads).
    *
    * The input is repartitioned on the bucket keys first: bucketBy
    * splits EACH write task's rows into the buckets it sees, so a
    * many-partition input would otherwise write up to tasks × buckets
    * small files (a 2000-partition frame at 256 buckets → ~512k files
    * — metastore and planner poison at the scale this helper exists
    * for). After the repartition each task holds exactly one bucket's
    * rows and writes exactly one file. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: String*): Unit = {
    require(keys.nonEmpty, "writeBucketed needs at least one bucket key")
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .saveAsTable(table)
  }
}
