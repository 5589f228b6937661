package graft.core

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Column domain bounds from parquet FOOTER statistics — the metadata a
  * stats-pruning reader (and this engine's q259 z-order skipper) already
  * maintains, reused here to size histogram kernels without a data scan.
  *
  * [[graft.operators.Selection]]'s two-phase selection needs only an
  * UPPER BOUND on the value domain to pick its bucket width; footer
  * min/max gives that bound from row-group metadata alone, so the common
  * "order statistic over a parquet column" case runs in exactly two data
  * scans instead of three. The bound is a granularity hint — Selection's
  * answer is exact regardless — so the lossy double→long ceiling below is
  * safe.
  *
  * Driver cost: one footer read per file (the same O(files) walk any
  * planner's stats collection performs); no row data is touched.
  */
object FooterStats {

  /** Every `*.parquet` file under `root`, recursively. The single listing
    * used by every footer consumer (here, q276's compaction inventory,
    * q279's bloom walk) so listing quirks — marker files, empty dirs,
    * object-store behaviors — get fixed in one place.
    */
  def listParquetFiles(spark: SparkSession, root: String): Seq[Path] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val rp = new Path(root)
    val fs = rp.getFileSystem(hconf)
    if (!fs.exists(rp)) return Seq.empty
    val it = fs.listFiles(rp, true)
    val b = Seq.newBuilder[Path]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) b += f
    }
    b.result()
  }

  /** Max of an INT64 or DOUBLE column across every row group under
    * `path` (a parquet file or a directory of them), rounded UP to a
    * long for doubles. None when the path has no parquet files, the
    * column is missing, or any row-group footer lacks min/max stats —
    * callers fall back to the sizing scan.
    */
  def longMax(spark: SparkSession, path: String, column: String): Option[Long] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = listParquetFiles(spark, path)
    if (files.isEmpty) return None
    val perFile = files.map { p =>
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(p, hconf))
      try {
        val maxes = r.getFooter.getBlocks.asScala.toSeq
          .filter(_.getRowCount > 0)
          .map { blk =>
            blk.getColumns.asScala.find(_.getPath.toDotString == column) match {
              case None => return None
              case Some(cc) =>
                val st = cc.getStatistics
                if (st == null || !st.hasNonNullValue) return None
                st.genericGetMax match {
                  case l: java.lang.Long => l.longValue
                  case d: java.lang.Double => math.ceil(d.doubleValue).toLong
                  case i: java.lang.Integer => i.longValue
                  case _ => return None
                }
            }
          }
        // a 0-row file has no stats to offer but shouldn't veto the bound
        if (maxes.isEmpty) None else Some(maxes.max)
      } finally r.close()
    }
    val known = perFile.flatten
    if (known.isEmpty) None else Some(known.max)
  }
}
