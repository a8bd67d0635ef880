package org.apache.spark

/** Test-only: SparkContext has no public unset for the checkpoint dir,
  * but the reliable-vs-local freeze spec must restore the suite's shared
  * session to its single-JVM default after pinning the reliable mode. */
object TestCheckpointDir {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
}
