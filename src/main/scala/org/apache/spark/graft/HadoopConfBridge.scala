package org.apache.spark.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` SerializableConfiguration (the
  * same visibility bridge pattern as `sql.graft.ColumnBridge`): lets
  * library code ship the driver's Hadoop configuration — filesystem
  * implementations, object-store credentials, tuning — to executor
  * tasks, instead of rebuilding a default `new Configuration()` that
  * silently drops them on a real cluster. */
object HadoopConfBridge {

  /** Opaque serializable handle; only exposes the plain Configuration. */
  final class Handle private[HadoopConfBridge] (
      b: Broadcast[SerializableConfiguration]) extends Serializable {
    def conf: Configuration = b.value.value
  }

  def broadcast(sc: SparkContext, conf: Configuration): Handle =
    new Handle(SerializableConfiguration.broadcast(sc, conf))
}
