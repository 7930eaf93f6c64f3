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

  /** Delete the target split directories before a (re-)write: a rerun
    * with fewer upstream partitions would otherwise leave stale
    * part-files from the prior run mixed into the output. */
  private def clean(conf: Configuration, dir: String, splits: Seq[String]): Unit =
    splits.foreach { s =>
      val d = new Path(s"$dir/$s")
      val fs = d.getFileSystem(conf)
      if (fs.exists(d)) fs.delete(d, true)
    }

  def write(payloads: Dataset[Array[Byte]], dir: String, split: String): Long = {
    val splitDir = s"$dir/$split"
    val conf = HadoopConfs.serializable(payloads.sparkSession)
    clean(conf.value, dir, Seq(split))
    val written = payloads.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val path = new Path(f"$splitDir/part-$pid%05d.tfrecord.gz")
      val fs = path.getFileSystem(conf.value)
      val out = TfRecord.gzipWriter(fs.create(path, true))
      var n = 0L
      try it.foreach { bytes => TfRecord.writeRecord(out, bytes); n += 1 }
      finally out.close()
      Iterator.single(n)
    }(org.apache.spark.sql.Encoders.scalaLong)
    written.reduce(_ + _)
  }

  /** Single-pass partitioned write: ONE upstream execution fans records
    * into every split at once. `routed` carries `payload: binary` plus
    * `split_idx: int` (0-based index into `names`); each task holds one
    * open writer per split and routes records as they stream through —
    * the Spark shape of the reference's per-split WriteSplit loop
    * (`executor.py:166-184`) without re-running the pipeline per split,
    * which at 100 TB multiplies the whole job by the split count.
    * Returns per-split record counts. */
  def writePartitioned(
      routed: org.apache.spark.sql.DataFrame,
      dir: String,
      names: Seq[String]): Map[String, Long] = {
    val nSplits = names.size
    val conf = HadoopConfs.serializable(routed.sparkSession)
    clean(conf.value, dir, names)
    // (splitIdx, count) per task: tiny driver-side metadata (partitions
    // × splits tuples), the same footprint as the old write().reduce.
    val counts = routed.select("payload", "split_idx").mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val writers = names.map { name =>
        val path = new Path(f"$dir/$name/part-$pid%05d.tfrecord.gz")
        TfRecord.gzipWriter(path.getFileSystem(conf.value).create(path, true))
      }.toArray
      val n = new Array[Long](nSplits)
      try it.foreach { r =>
        val idx = r.getInt(1)
        TfRecord.writeRecord(writers(idx), r.getAs[Array[Byte]](0))
        n(idx) += 1
      } finally writers.foreach(_.close())
      Iterator.range(0, nSplits).map(i => (i, n(i)))
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    val agg = counts.groupBy(_._1).map { case (i, xs) => names(i) -> xs.map(_._2).sum }
    names.map(nm => nm -> agg.getOrElse(nm, 0L)).toMap
  }

  /** Read shards back (test/verification path; use
    * [[TfRecordSource.read]] for the distributed path). */
  def readAll(spark: org.apache.spark.sql.SparkSession, dir: String, split: String): Seq[Array[Byte]] = {
    val path = new Path(s"$dir/$split")
    val fs = path.getFileSystem(HadoopConfs.of(spark))
    if (!fs.exists(path)) return Nil
    fs.listStatus(path).filter(_.getPath.getName.endsWith(".tfrecord.gz")).toSeq
      .sortBy(_.getPath.getName)
      .flatMap(st => TfRecord.readAll(fs.open(st.getPath), gzipped = true).toSeq)
  }
}
