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

  /** Planning-cost cap for multi-file aggregation: each file costs a
    * header (and optionally index) read at table-construction time. */
  private val MaxAggregatedFiles = 64

  /** Table-level properties. Multi-file tables aggregate across files —
    * chrom dictionary as a first-seen union, index counts summed — so a
    * 10-file table doesn't present one file's BAI totals as the table's.
    * Aggregation is capped at [[MaxAggregatedFiles]] to bound planning
    * cost on huge globs; when capped, `properties_scope` records the
    * sample honestly instead of implying table-level totals. */
  def forPaths(paths: Seq[Path], zoom: Boolean = false,
      indexStats: Boolean = false): java.util.Map[String, String] = {
    if (paths.lengthCompare(1) <= 0)
      return paths.headOption.map(forPath(_, zoom, indexStats))
        .getOrElse(new java.util.LinkedHashMap[String, String]())
    val m = new java.util.LinkedHashMap[String, String]()
    val sample = paths.take(MaxAggregatedFiles)
    if (sample.length < paths.length)
      m.put("properties_scope",
        s"first_${sample.length}_of_${paths.length}_files")
    // per-file metadata reads run in parallel (each is 1-3 round-trips
    // on an object store; 64 sequential opens would serialize table
    // construction), but the merge walks futures in path order so the
    // first-seen union stays deterministic
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(8, sample.length))
    val perFile: Seq[(Map[String, Long], Seq[Int], Map[String, (Long, Long)])] =
      try {
        sample.map { p =>
          pool.submit(new java.util.concurrent.Callable[
              (Map[String, Long], Seq[Int], Map[String, (Long, Long)])] {
            def call() = (
              Try(GraftMeta.chromSizes(p.toString)).getOrElse(Map.empty),
              if (zoom) Try(GraftMeta.zoomLevels(p.toString)).getOrElse(Nil)
              else Nil,
              if (indexStats)
                Try(GraftMeta.indexStats(p.toString)).getOrElse(Map.empty)
              else Map.empty)
          })
        }.map(_.get())
      } finally pool.shutdown()
    val sizes = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    perFile.foreach(_._1.foreach { case (n, s) =>
      if (!sizes.contains(n)) sizes(n) = s
    })
    if (sizes.nonEmpty) {
      val sorted = sizes.toSeq.sortBy(_._1)
      m.put("chrom_names", sorted.map(_._1).mkString(","))
      m.put("chrom_sizes",
        sorted.map { case (n, s) => s"$n:$s" }.mkString(","))
    }
    if (zoom) {
      val zl = perFile.flatMap(_._2).distinct.sorted
      if (zl.nonEmpty) m.put("zoom_levels", zl.mkString(","))
    }
    if (indexStats) {
      val agg = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
      perFile.foreach(_._3.foreach { case (n, (ma, um)) =>
        val cur = agg.getOrElse(n, (0L, 0L))
        agg(n) = (cur._1 + ma, cur._2 + um)
      })
      if (agg.nonEmpty) {
        m.put("index.n_mapped", agg.values.map(_._1).sum.toString)
        m.put("index.n_unmapped", agg.values.map(_._2).sum.toString)
        m.put("index.record_counts", agg.toSeq.sortBy(_._1)
          .map { case (n, (ma, um)) => s"$n:$ma:$um" }.mkString(","))
      }
    }
    m
  }
}
