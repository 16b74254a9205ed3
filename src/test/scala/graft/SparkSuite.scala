package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites. */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuite.session

  override def afterAll(): Unit = super.afterAll()

  /** Write lines to a temp file and return its absolute path. */
  def tempFile(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test")
    val f = dir.resolve(name)
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  /** Write lines gzip-compressed. */
  def tempGzFile(name: String, lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-test")
    val f = dir.resolve(name)
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(f))
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
    f.toString
  }
}

object SparkSuite {
  private var cached: SparkSession = _

  /** Shared session, rebuilt if a suite (e.g. the extensions spec) stopped
    * the active one. */
  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      cached = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.warehouse.dir", java.nio.file.Files
          .createTempDirectory("graft-warehouse").toString)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        // testdata events.parquet carries nanosecond timestamps; match
        // the Verify/Bench sessions so specs can read it
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      cached.sparkContext.setLogLevel("WARN")
    }
    cached
  }
}
