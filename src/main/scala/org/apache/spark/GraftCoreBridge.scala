package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** Bridge into `private[spark]` task internals so graft's physical
  * operators can register their memory with Spark's unified memory
  * manager (the same TaskMemoryManager every built-in spillable exec
  * accounts through). Same one-file-in-spark's-namespace technique as
  * `org.apache.spark.sql.GraftSqlBridge`. */
object GraftCoreBridge {
  def taskMemoryManager(tc: TaskContext): TaskMemoryManager =
    tc.taskMemoryManager()
}
