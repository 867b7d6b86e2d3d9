package graft.sinks

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.operators.MergeOps
import graft.operators.MergeOps.MergeSpec
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet merge table — the engine's stand-in for the
  * reference's Delta Lake sink (formats/deltalake.py:92-168), with the
  * same merge semantics (K1-K4) but no Delta dependency (none on this
  * classpath). On a deployment with Delta available, [[MergeOps]] plugs
  * straight into `DeltaTable.merge`; this class provides the
  * local/HDFS-compatible equivalent:
  *
  *  - each mutation writes a NEW version directory `v{N}` then atomically
  *    publishes it via a `_latest` pointer file (readers never see
  *    partial writes; concurrent readers keep their version — the same
  *    snapshot-isolation contract Delta's log gives)
  *  - merge = read-current ⋈ updates via MergeOps (one shuffle)
  *  - optimize() rewrites the current version with right-sized files
  *    (compaction, K4); vacuum() drops unreferenced versions
  */
final class GraftTable(spark: SparkSession, path: String, spec: MergeSpec) {

  private def latestFile = Paths.get(path, "_latest")

  def currentVersion: Option[Int] =
    if (Files.exists(latestFile))
      Some(new String(Files.readAllBytes(latestFile), "UTF-8").trim.toInt)
    else None

  def exists: Boolean = currentVersion.isDefined

  def read(): DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(s"$path/v$v")
    case None =>
      throw new IllegalStateException(s"GraftTable $path has no data yet")
  }

  /** Time travel: read a specific historical version (available until
    * [[vacuum]] drops it) — the reference's tests read Delta tables
    * with time travel the same way (tests/utils.py:188-210).
    */
  def readVersion(version: Int): DataFrame = {
    val dir = Paths.get(path, s"v$version")
    if (!Files.exists(dir))
      throw new IllegalArgumentException(
        s"version $version of $path does not exist (vacuumed?)")
    spark.read.parquet(dir.toString)
  }

  /** All retained version numbers, oldest first. */
  def versions: Seq[Int] = {
    val dir = Paths.get(path)
    if (!Files.exists(dir)) Nil
    else {
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      Files.list(dir).forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("v") && n.drop(1).forall(_.isDigit))
          out += n.drop(1).toInt
      }
      out.sorted.toSeq
    }
  }

  /** K1/J1-J3: merge a batch in. First write creates the table. */
  def merge(updates: DataFrame): Unit = currentVersion match {
    case None => publish(updates)
    case Some(_) => publish(MergeOps.merge(read(), updates, spec))
  }

  /** K3: delete by id values (single-column DataFrame). */
  def deleteIds(ids: DataFrame): Unit =
    if (exists)
      publish(MergeOps.deleteByIds(read(), spec.keys.head, ids))

  /** K4: compaction — rewrite current data with `numFiles` files. */
  def optimize(numFiles: Int = 1): Unit =
    if (exists) publish(read().repartition(numFiles))

  /** K4: drop all superseded version directories. */
  def vacuum(): Unit = currentVersion.foreach { keep =>
    val dir = Paths.get(path)
    if (Files.exists(dir)) {
      Files.list(dir).forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name != s"v$keep")
          deleteRecursively(p)
      }
    }
  }

  private def publish(df: DataFrame): Unit = {
    val next = currentVersion.map(_ + 1).getOrElse(0)
    df.write.mode("overwrite").parquet(s"$path/v$next")
    val tmp = Paths.get(path, "_latest.tmp")
    Files.write(tmp, next.toString.getBytes("UTF-8"))
    Files.move(tmp, latestFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object GraftTable {
  def apply(spark: SparkSession, path: String, spec: MergeSpec): GraftTable =
    new GraftTable(spark, path, spec)
}
