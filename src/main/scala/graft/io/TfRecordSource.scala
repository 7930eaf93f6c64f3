package graft.io

import org.apache.hadoop.conf.Configuration
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
  * partitioning.
  */
object TfRecordSource {

  /** All record payloads under `dir`/`split` as a distributed dataset. */
  def read(spark: SparkSession, dir: String, split: String): Dataset[Array[Byte]] = {
    val base = new Path(s"$dir/$split")
    val fs = base.getFileSystem(new Configuration())
    val files: Seq[String] =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq
        .filter(_.getPath.getName.endsWith(".tfrecord.gz"))
        .map(_.getPath.toString).sorted
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files)(Encoders.STRING)
      .repartition(parallelism)
      .mapPartitions { paths =>
        paths.flatMap { f =>
          val p = new Path(f)
          TfRecord.readAll(p.getFileSystem(new Configuration()).open(p), gzipped = true)
        }
      }(Encoders.BINARY)
  }
}
