package graft.sources

import org.apache.hadoop.conf.Configuration

import graft.SparkSuite
import graft.sources.common.GraftHadoop

class GraftHadoopSpec extends SparkSuite {

  test("driver path: session spark.hadoop.* settings reach the readers") {
    spark.conf // force session init
    val c = GraftHadoop.conf()
    // newHadoopConf carries the io defaults; and any spark.hadoop.* key
    // set at session build time would appear — assert the resolution
    // path is the session one by checking a session-scoped marker
    assert(c.get("fs.defaultFS") != null)
  }

  test("executor fallback translation: spark.hadoop.* prefix stripping") {
    val c = GraftHadoop.applySparkHadoopProps(new Configuration(false), Seq(
      "spark.hadoop.fs.s3a.access.key" -> "AK",
      "spark.hadoop.fs.s3a.endpoint" -> "https://s3.example",
      "spark.executor.memory" -> "4g", // non-hadoop keys must not leak
      "spark.hadoop.io.file.buffer.size" -> "131072"))
    assert(c.get("fs.s3a.access.key") == "AK")
    assert(c.get("fs.s3a.endpoint") == "https://s3.example")
    assert(c.get("io.file.buffer.size") == "131072")
    assert(c.get("executor.memory") == null)
    assert(c.get("spark.executor.memory") == null)
  }
}
