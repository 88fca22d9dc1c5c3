package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet read-through cache — the reference's pickle cache
  * contract (`main.py:24-31`: probe path, read if present, else
  * compute + persist) re-expressed on the FileSystem API so it works
  * against any Hadoop-compatible store (local, HDFS, object stores).
  * Parquet replaces pickle as the canonical persisted form
  * (SURVEY.md §2.1 S4/S8): columnar, splittable, engine-neutral.
  */
object CachedParquet {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read `cachePath` if present; otherwise materialise `build`
    * there and read it back (read-back, not passthrough, so callers
    * always get the same physical source either way). */
  def readThrough(spark: SparkSession, cachePath: String)
                 (build: => DataFrame): DataFrame = {
    if (!exists(spark, cachePath))
      build.write.mode("overwrite").parquet(cachePath)
    spark.read.parquet(cachePath)
  }
}
