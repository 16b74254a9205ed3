package graft.sources.common

import org.apache.hadoop.conf.Configuration

/** Hadoop configuration resolution for the graft readers.
  *
  * A bare `new Configuration()` never sees `spark.hadoop.*` settings
  * (S3/GCS credentials, endpoint overrides, timeouts), so every
  * filesystem access in the sources resolves through here, in order:
  *
  *  1. the active/default SparkSession's `newHadoopConf()` when one is
  *     reachable — always true on the driver, and in local mode (where
  *     executors share the JVM) on the executor side too;
  *  2. on a remote executor (no session objects), the executor's
  *     [[org.apache.spark.SparkEnv]] SparkConf — the application conf
  *     Spark ships to every executor — with its `spark.hadoop.*` keys
  *     applied, so credentials and endpoints passed via `--conf` /
  *     `spark-defaults.conf` reach the partition readers;
  *  3. a fresh default only when no Spark runtime exists at all
  *     (plain unit-test contexts).
  *
  * Remaining corner: a `spark.conf.set("spark.hadoop.x", ...)` made at
  * RUNTIME mutates only the driver's session state, which path 2 cannot
  * see — such settings must be supplied at submit time (or the caller
  * passes a fully-configured Configuration explicitly).
  */
object GraftHadoop {

  /** Apply `spark.hadoop.*`-prefixed entries of a Spark conf listing
    * onto a Hadoop configuration (the same translation
    * `SparkHadoopUtil` performs; re-implemented because that class is
    * private to Spark). */
  private[sources] def applySparkHadoopProps(c: Configuration,
      all: Iterable[(String, String)]): Configuration = {
    all.foreach { case (k, v) =>
      if (k.startsWith("spark.hadoop."))
        c.set(k.stripPrefix("spark.hadoop."), v)
    }
    c
  }

  def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse {
        val env = org.apache.spark.SparkEnv.get
        if (env != null)
          applySparkHadoopProps(new Configuration(), env.conf.getAll)
        else new Configuration()
      }
}
