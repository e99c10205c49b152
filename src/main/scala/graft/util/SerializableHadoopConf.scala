package graft.util

/** Hadoop `Configuration` is not `Serializable`; tasks that open an
  * `org.apache.hadoop.fs.FileSystem` (the egress sinks) ship the driver's
  * conf through this wrapper instead. Same shape as Spark's internal
  * `SerializableConfiguration` (which is `private[spark]`), re-implemented
  * from the public Writable contract: `Configuration.write/readFields`. */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
