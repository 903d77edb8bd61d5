package graft.sources

import org.apache.spark.sql.DataFrame

/**
 * Guard for the driver-side single-file exporters (Shapefile, GeoPackage,
 * FlatGeobuf): these formats are unsplittable by construction, so writing
 * one means materializing the frame on the driver — correct for RESULTS
 * (the reference's exports are single files too), an OOM for raw inputs.
 * The guard makes that boundary explicit instead of letting a 100 TB
 * DataFrame reach collect(): row count is probed with a LIMIT (early-exit
 * scan, never a full count) and a clear error points at the partitioned
 * formats. Tune with spark.graft.singleFileWriter.maxRows.
 */
object SingleFile {

  val MaxRowsKey = "spark.graft.singleFileWriter.maxRows"
  val DefaultMaxRows = 10000000L

  def guard(df: DataFrame, format: String): Unit = {
    val max = df.sparkSession.conf.getOption(MaxRowsKey)
      .map(_.toLong).getOrElse(DefaultMaxRows)
    if (max > 0 && max < Long.MaxValue) {
      // limit-probe: scans at most max+1 rows, not the whole input
      val probe = df.limit((max + 1).toInt.max(1)).count()
      require(probe <= max,
        s"$format is a single-file driver-side export and the input exceeds " +
          s"$max rows ($MaxRowsKey): write results, not raw inputs — for " +
          "large data use writeGeoParquet (splittable, bbox covering columns) " +
          "or ArrowIPC (one file per partition)")
    }
  }
}
