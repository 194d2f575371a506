package graft.sources

import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame

/** Write a DataFrame as ONE parquet FILE at an exact path.
  *
  * Needed because the Structured Streaming file source does not recurse
  * into non-`key=value` subdirectories — stream-input slices must be
  * plain files in the stream directory root, which `df.write.parquet`
  * (always a directory) cannot produce directly.
  */
object ParquetSlices {
  def writeSingleFile(df: DataFrame, target: Path): Unit = {
    val tmp = Files.createTempDirectory("slice").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part file produced in $tmp"))
    Files.createDirectories(target.getParent)
    Files.move(part.toPath, target)
  }
}
