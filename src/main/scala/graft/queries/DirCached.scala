package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, dir) materialized-intermediate cache — the local
  * analogue of a 100 TB pipeline's compute-once-read-forever stage
  * outputs (signatures, rollups, codebooks). Shared by the query packs.
  *
  * Entries for stopped sessions are pruned on every access: a
  * WeakHashMap alone never frees them, because the cached DataFrame
  * VALUES strongly reference their own SparkSession key (a value → key
  * strong reference defeats key weakness per the WeakHashMap
  * contract). */
private[queries] final class DirCached {
  private val cache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]

  def apply(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    cache.synchronized {
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var perDir = cache.get(s)
      if (perDir == null) {
        perDir = scala.collection.mutable.Map.empty[String, DataFrame]
        cache.put(s, perDir)
      }
      perDir.getOrElseUpdate(
        dir, build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
}
