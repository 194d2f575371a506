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
    val tmpDir = Files.createTempDirectory("slice")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val part = tmpDir.toFile.listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no parquet part file produced in $tmpDir"))
      Files.createDirectories(target.getParent)
      Files.move(part.toPath, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally {
      // the scratch dir (leftover _SUCCESS/.crc files) must not pile up
      // in /tmp across calls
      Option(tmpDir.toFile.listFiles()).foreach(_.foreach(_.delete()))
      Files.deleteIfExists(tmpDir)
    }
  }

  /** Recursive local-FS delete — the single shared copy (UpsertStream,
    * Verify, Layout all need it; independent copies drifted before). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
