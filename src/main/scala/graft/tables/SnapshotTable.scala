package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer: partitioned parquet + an atomically
  * committed manifest pointer, giving the three properties the crawl state
  * machine needs (SURVEY.md §7): atomic snapshot commit, resumable cursor,
  * time travel. No Iceberg runtime jar ships in this sandbox, so the
  * manifest is a JSON file and the commit point is a filesystem
  * atomic-rename of the LATEST pointer — the same commit discipline as the
  * reference's whole-file checkpoint overwrite
  * (/root/reference/state/state.go:83-96), but versioned instead of
  * destructive. On a real deployment this class is the seam where an actual
  * Iceberg/Delta catalog plugs in.
  *
  * Layout:
  *   dir/snap-%06d/<name>/   parquet per logical table
  *   dir/snap-%06d/MANIFEST  committed table names + row counts
  *   dir/LATEST              current snapshot id (atomic rename target)
  *
  * A crash between data write and LATEST rename leaves an orphan snapshot
  * directory that is never referenced — readers only follow LATEST, so
  * resume semantics are exactly "last committed snapshot" (at-least-once
  * downstream, SURVEY.md §2.9).
  */
final class SnapshotTable(val dir: String) {
  private val root: Path = Paths.get(dir)

  private def snapDir(id: Long): Path = root.resolve(f"snap-$id%06d")

  def latestSnapshot: Option[Long] = {
    val p = root.resolve("LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Write all `tables` as parquet under a new snapshot, then atomically
    * publish it. Returns the new snapshot id.
    */
  def commit(tables: Map[String, DataFrame]): Long = {
    val id = latestSnapshot.map(_ + 1).getOrElse(0L)
    val sd = snapDir(id)
    Files.createDirectories(sd)
    val counts = tables.map { case (name, df) =>
      df.write.mode("overwrite").parquet(sd.resolve(name).toString)
      name -> -1L // counts not materialized: avoid an extra action per table
    }
    val manifest = counts.keys.toSeq.sorted.mkString("\n")
    Files.writeString(sd.resolve("MANIFEST"), manifest)
    val tmp = root.resolve(s".LATEST.tmp-$id")
    Files.writeString(tmp, id.toString)
    Files.move(tmp, root.resolve("LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** Read a logical table at the latest (or a pinned) snapshot. */
  def read(spark: SparkSession, name: String, snapshot: Option[Long] = None): DataFrame = {
    val id = snapshot.orElse(latestSnapshot).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $dir"))
    spark.read.parquet(snapDir(id).resolve(name).toString)
  }

  def tableNames(snapshot: Option[Long] = None): Seq[String] = {
    val id = snapshot.orElse(latestSnapshot).getOrElse(return Seq.empty)
    Files.readString(snapDir(id).resolve("MANIFEST")).split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Drop all snapshots older than `keep` behind latest (compaction safety:
    * never drops the latest, so resume is unaffected — FIXTURES.md §5).
    */
  def expireOldSnapshots(keep: Int = 2): Unit = {
    latestSnapshot.foreach { latest =>
      Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("snap-"))
        .filter(p => p.getFileName.toString.stripPrefix("snap-").toLong < latest - keep + 1)
        .foreach(deleteRecursively)
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
