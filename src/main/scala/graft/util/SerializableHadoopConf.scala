package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/**
 * Serializable wrapper for a Hadoop Configuration so executor-side tasks
 * (deletion-vector decode, footer reads) can open the table's filesystem
 * with the driver's settings. Spark's own equivalent is private[spark];
 * the pattern is standard for file-source connectors.
 */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
