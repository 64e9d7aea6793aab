package graft.queries

import org.apache.spark.sql.SparkSession

/**
 * Unique per-SparkSession memo-key component for the shared-frame / store-dir
 * memos in the query registries. `System.identityHashCode` (the previous key)
 * is not unique — two sessions in one JVM can collide, and a stopped
 * session's hash can be reassigned, handing a later session a temp directory
 * built by another one. A weak identity map with a UUID per session is
 * collision-free and lets dead sessions' entries be collected.
 */
private[queries] object SessionKeys {
  // java.util.WeakHashMap keys by equals/hashCode; SparkSession does not
  // override them, so this is identity-keyed with weak-reference cleanup
  private val ids = new java.util.WeakHashMap[SparkSession, String]()
  def key(s: SparkSession): String = ids.synchronized {
    var id = ids.get(s)
    if (id == null) { id = java.util.UUID.randomUUID().toString; ids.put(s, id) }
    id
  }
}
