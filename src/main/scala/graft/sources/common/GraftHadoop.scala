package graft.sources.common

import org.apache.hadoop.conf.Configuration

/** Hadoop configuration resolution for the graft readers.
  *
  * A bare `new Configuration()` never sees `spark.hadoop.*` session
  * settings (S3/GCS credentials, endpoint overrides, timeouts), so
  * every filesystem access in the sources resolves through here: the
  * active/default SparkSession's `newHadoopConf()` when one is
  * reachable — always true on the driver, and in local mode (where
  * executors share the JVM) on the executor side too — falling back to
  * a fresh default otherwise. On a multi-node cluster the executor-side
  * fallback still lacks session settings; fully propagating them would
  * require carrying a SerializableConfiguration in every
  * InputPartition, noted as the follow-up for remote-filesystem
  * deployments.
  */
object GraftHadoop {
  def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}
