package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Hadoop `Configuration` is not `Serializable`; this wrapper ships its
  * key-value pairs to executors so tasks resolve filesystems with the
  * SESSION'S Hadoop settings (`spark.hadoop.*`, programmatic overrides,
  * object-store credentials) instead of a bare `new Configuration()`
  * that never saw them. */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object HadoopConfs {
  /** The session's effective Hadoop conf (driver side). */
  def of(spark: SparkSession): Configuration = spark.sessionState.newHadoopConf()

  /** Same, wrapped for shipping into tasks. */
  def serializable(spark: SparkSession): SerializableHadoopConf =
    new SerializableHadoopConf(of(spark))
}
