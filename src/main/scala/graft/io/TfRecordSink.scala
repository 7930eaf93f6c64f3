package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** Distributed TFRecord sink: each task writes its partition as one
  * gzipped shard `<dir>/<split>/part-NNNNN.tfrecord.gz` via the Hadoop
  * FileSystem API (works on local FS, HDFS, object stores alike — the
  * cluster-scale path; no driver materialization).
  *
  * Mirrors the reference's split TFRecord layout (TFX `WriteSplit`,
  * invoked via `feast_component/executor.py:181`).
  */
object TfRecordSink {

  def write(payloads: Dataset[Array[Byte]], dir: String, split: String): Long = {
    val splitDir = s"$dir/$split"
    val written = payloads.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val path = new Path(f"$splitDir/part-$pid%05d.tfrecord.gz")
      val fs = path.getFileSystem(new Configuration())
      val out = TfRecord.gzipWriter(fs.create(path, true))
      var n = 0L
      try it.foreach { bytes => TfRecord.writeRecord(out, bytes); n += 1 }
      finally out.close()
      Iterator.single(n)
    }(org.apache.spark.sql.Encoders.scalaLong)
    written.reduce(_ + _)
  }

  /** Read shards back (test/verification path). */
  def readAll(spark: org.apache.spark.sql.SparkSession, dir: String, split: String): Seq[Array[Byte]] = {
    val path = new Path(s"$dir/$split")
    val fs = path.getFileSystem(new Configuration())
    if (!fs.exists(path)) return Nil
    fs.listStatus(path).filter(_.getPath.getName.endsWith(".tfrecord.gz")).toSeq
      .sortBy(_.getPath.getName)
      .flatMap(st => TfRecord.readAll(fs.open(st.getPath), gzipped = true).toSeq)
  }
}
