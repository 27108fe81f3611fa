package org.apache.spark

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, but
  * specs that count listener events (IvfIndexSpec's zero-count()-jobs
  * pin) need a deterministic drain instead of a fixed sleep — a loaded
  * host can outlast any pause and let a late event falsely pass the
  * assertion. Exposes exactly `LiveListenerBus.waitUntilEmpty`.
  */
object ListenerBusDrain {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
