package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem probes that work on any Hadoop-supported URI (file://,
  * hdfs://, s3a://). `java.io.File` only sees the local filesystem — on an
  * object store it reports `false` for every path, which would make the
  * streaming admission classes silently take their empty-index branch
  * forever and admit duplicates.
  */
object Fs {
  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
