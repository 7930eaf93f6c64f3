package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Distributed TFRecord source — the read half of the split layout
  * [[TfRecordSink]] writes (the reference's output artifact,
  * `executor.py:163-164`), so a training pipeline can re-consume its
  * own shards without a driver-side materialization.
  *
  * Shape: the driver lists shard paths (metadata only), distributes
  * one shard per task, and each task streams records off the Hadoop
  * FS lazily — payload bytes never collect at the driver and never
  * shuffle. Gzipped TFRecord frames are not block-splittable, so the
  * parallelism unit is the shard; the sink writes one shard per
  * upstream partition, which keeps shard sizes bounded by upstream
  * partitioning. Filesystems resolve from the session's Hadoop conf
  * (object-store credentials included); each shard's stream closes as
  * soon as its iterator drains.
  */
object TfRecordSource {

  /** All record payloads under `dir`/`split` as a distributed dataset. */
  def read(spark: SparkSession, dir: String, split: String): Dataset[Array[Byte]] = {
    val base = new Path(s"$dir/$split")
    val fs = base.getFileSystem(HadoopConfs.of(spark))
    val files: Seq[String] =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq
        .filter(_.getPath.getName.endsWith(".tfrecord.gz"))
        .map(_.getPath.toString).sorted
    val conf = HadoopConfs.serializable(spark)
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files)(Encoders.STRING)
      .repartition(parallelism)
      .mapPartitions { paths =>
        // one stream open at a time per task; closed when its shard
        // drains AND (belt-and-braces) at task completion, so early
        // termination (limit, failure mid-shard) can't leak the
        // descriptor / pooled object-store connection
        var open: java.io.Closeable = null
        def closeOpen(): Unit = if (open != null) { open.close(); open = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOpen()))
        paths.flatMap { f =>
          val p = new Path(f)
          val in = p.getFileSystem(conf.value).open(p)
          open = in
          val records = TfRecord.readAll(in, gzipped = true)
          new Iterator[Array[Byte]] {
            def hasNext: Boolean = {
              val h = records.hasNext
              if (!h) closeOpen()
              h
            }
            def next(): Array[Byte] = records.next()
          }
        }
      }(Encoders.BINARY)
  }
}
