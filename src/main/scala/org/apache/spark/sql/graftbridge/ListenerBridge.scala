package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/**
 * Test-support access to the `private[spark]` listener bus: lets a spec
 * drain pending listener events before asserting on job counts (the bus
 * delivers asynchronously, so a count read without draining can miss
 * jobs that already ran).
 */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
