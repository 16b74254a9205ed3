package graft.sources.common

import scala.util.Try

import org.apache.hadoop.fs.Path

import graft.formats.GraftMeta

/** Catalog metadata surface (SURVEY §2.5 M5).
  *
  * The reference exposes `chrom_names` / `chrom_sizes` / `zoom_levels` and
  * index record statistics on every scanner handle
  * (`/root/reference/oxbow/src/alignment/scanner/bam.rs:74-89`,
  * `/root/reference/oxbow/src/bbi/scanner/bigwig.rs:94-117`). The
  * Spark-native equivalent is DSv2 `Table.properties()`: visible
  * programmatically on any loaded table and through catalog surfaces
  * (`DESCRIBE EXTENDED` when the table is registered with a catalog).
  *
  * Every section is best-effort: a missing companion index or unreadable
  * header omits its properties rather than failing the read path — the
  * metadata surface must never make a scan less available than it was
  * without it.
  */
object GraftTableProps {

  /** Property map for one file. `zoom` adds BBI zoom reduction levels;
    * `indexStats` adds BAI/CSI/TBI pseudo-bin record counts. */
  def forPath(path: Path, zoom: Boolean = false,
      indexStats: Boolean = false): java.util.Map[String, String] = {
    val m = new java.util.LinkedHashMap[String, String]()
    Try(GraftMeta.chromSizes(path.toString)).toOption
      .filter(_.nonEmpty).foreach { sizes =>
      val sorted = sizes.toSeq.sortBy(_._1)
      m.put("chrom_names", sorted.map(_._1).mkString(","))
      m.put("chrom_sizes",
        sorted.map { case (n, s) => s"$n:$s" }.mkString(","))
    }
    if (zoom)
      Try(GraftMeta.zoomLevels(path.toString)).toOption.foreach { zl =>
        m.put("zoom_levels", zl.mkString(","))
      }
    if (indexStats)
      Try(GraftMeta.indexStats(path.toString)).toOption
        .filter(_.nonEmpty).foreach { st =>
          m.put("index.n_mapped", st.values.map(_._1).sum.toString)
          m.put("index.n_unmapped", st.values.map(_._2).sum.toString)
          m.put("index.record_counts", st.toSeq.sortBy(_._1)
            .map { case (n, (ma, um)) => s"$n:$ma:$um" }.mkString(","))
        }
    m
  }

  def forPaths(paths: Seq[Path], zoom: Boolean = false,
      indexStats: Boolean = false): java.util.Map[String, String] =
    paths.headOption.map(forPath(_, zoom, indexStats))
      .getOrElse(new java.util.LinkedHashMap[String, String]())
}
