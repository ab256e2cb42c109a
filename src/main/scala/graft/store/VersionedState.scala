package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet state with an atomically-flipped `_CURRENT`
  * pointer — the persistence layout shared by the incremental stores
  * ([[MaterializedView]], [[DedupIndex]]). Parquet cannot be read and
  * overwritten in place, so each refresh writes the NEXT `v=N`
  * directory and renames `_CURRENT.tmp` over `_CURRENT`: a concurrent
  * reader resolves the old or the new version, never a torn one. */
private[graft] object VersionedState {

  def versionDir(path: String, v: Long): String = s"$path/v=$v"

  def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_CURRENT"))

  def currentVersion(path: String): Long =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_CURRENT")).trim.toLong

  def readCurrent(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(versionDir(path, currentVersion(path)))

  def writeVersion(state: DataFrame, path: String, v: Long): Unit = {
    state.write.mode("overwrite").parquet(versionDir(path, v))
    val tmp = java.nio.file.Paths.get(path, "_CURRENT.tmp")
    java.nio.file.Files.writeString(tmp, v.toString)
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path, "_CURRENT"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Remove superseded versions; `grace` keeps that many below current
    * so a reader that resolved the pointer just before a flip still
    * finds its files. */
  def compact(path: String, grace: Int = 1): Unit = {
    val cur = currentVersion(path)
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .filter(f => f.getName.drop(2).toLong < cur - grace)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }
}
